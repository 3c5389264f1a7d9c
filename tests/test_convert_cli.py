"""Offline pretrained-weights ingestion (round-3, VERDICT r2 ask #4).

A locally-built HF Wav2Vec2Model is `save_pretrained`-ed to disk (the
exact artifact a user would drop into the air-gapped environment), run
through cli.convert_hf_checkpoint, and loaded back via the
`--encoder_init <dir>` leg of cli/common.build_encoder. The converted
params must be bit-equal to the direct in-memory conversion, across
safetensors, torch-bin, and sharded-safetensors layouts.
Match: reference encoder.py:21 (`Wav2Vec2Model.from_pretrained`).
"""

import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

SMALL_KW = dict(
    hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=64, conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
    attention_dropout=0.0, activation_dropout=0.0, feat_proj_dropout=0.0,
    layerdrop=0.0, vocab_size=32,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.Wav2Vec2Config(
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True, **SMALL_KW)
    torch.manual_seed(0)
    return transformers.Wav2Vec2Model(cfg).eval()


@pytest.fixture(scope="module")
def expected(hf_model):
    from wav2vec_contr_loss_tpu.models.hf_convert import (
        config_from_hf, convert_hf_state_dict)

    cfg = config_from_hf(hf_model.config)
    return cfg, convert_hf_state_dict(hf_model.state_dict(), cfg)


def _assert_tree_equal(got, want):
    import jax

    gl, gt = jax.tree_util.tree_flatten(got)
    wl, wt = jax.tree_util.tree_flatten(want)
    assert gt == wt
    for g, w in zip(gl, wl):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _convert_and_check(src, out, expected):
    from wav2vec_contr_loss_tpu.cli import convert_hf_checkpoint
    from wav2vec_contr_loss_tpu.cli.common import build_encoder

    convert_hf_checkpoint.main(["--src", src, "--out", out])
    cfg, params = build_encoder("ignored", out)  # the --encoder_init leg
    want_cfg, want_params = expected
    assert cfg == want_cfg
    _assert_tree_equal(params, want_params)


def test_safetensors_snapshot_roundtrip(hf_model, expected, tmp_path):
    src = str(tmp_path / "snap")
    hf_model.save_pretrained(src, safe_serialization=True)
    assert os.path.exists(os.path.join(src, "model.safetensors"))
    _convert_and_check(src, str(tmp_path / "out"), expected)


def test_torch_bin_snapshot_roundtrip(hf_model, expected, tmp_path):
    src = str(tmp_path / "snap")
    hf_model.save_pretrained(src, safe_serialization=False)
    assert os.path.exists(os.path.join(src, "pytorch_model.bin"))
    _convert_and_check(src, str(tmp_path / "out"), expected)


def test_sharded_safetensors_roundtrip(hf_model, expected, tmp_path):
    """Big checkpoints arrive as *.index.json + shards; the loader must
    reassemble the full state dict across shards."""
    from safetensors.numpy import save_file

    src = str(tmp_path / "snap")
    os.makedirs(src)
    hf_model.config.save_pretrained(src)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        save_file({k: sd[k] for k in ks}, os.path.join(src, fname))
        weight_map.update({k: fname for k in ks})
    with open(os.path.join(src, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)
    _convert_and_check(src, str(tmp_path / "out"), expected)


def test_single_weights_file(hf_model, expected, tmp_path):
    """A bare .safetensors file with config.json beside it."""
    from safetensors.numpy import save_file

    src = str(tmp_path / "snap")
    os.makedirs(src)
    hf_model.config.save_pretrained(src)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    save_file(sd, os.path.join(src, "weights.safetensors"))
    _convert_and_check(os.path.join(src, "weights.safetensors"),
                       str(tmp_path / "out"), expected)


def test_missing_path_is_an_error(tmp_path):
    """Unlike encoder_init='pretrained' (which warns and falls back to
    random), an explicit path that doesn't resolve must raise — silently
    training from random weights would invalidate a parity run."""
    from wav2vec_contr_loss_tpu.cli.common import build_encoder

    with pytest.raises(FileNotFoundError):
        build_encoder("ignored", str(tmp_path / "nope"))


def test_converted_encoder_forward_matches_hf(hf_model, expected, tmp_path):
    """End-to-end: the encoder built from the converted-on-disk params
    reproduces the HF torch hidden states (same tolerance as the main
    parity suite)."""
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.cli import convert_hf_checkpoint
    from wav2vec_contr_loss_tpu.models.hf_convert import load_encoder_init
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder

    src = str(tmp_path / "snap")
    hf_model.save_pretrained(src)
    out = str(tmp_path / "out")
    convert_hf_checkpoint.main(["--src", src, "--out", out])
    cfg, params = load_encoder_init(out)

    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.2, (2, 2000)).astype(np.float32)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(wave)).last_hidden_state.numpy()
    enc = Wav2Vec2Encoder(cfg.with_(dtype=jnp.float32))
    got = enc.apply({"params": params}, jnp.asarray(wave))["last_hidden"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
