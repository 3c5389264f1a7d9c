"""HF export (models/export_hf.py): the inverse conversion round-trips.

torch HF model -> convert_hf_state_dict -> export back into a fresh
Wav2Vec2Model must reproduce the original torch forward bit-for-bit (the
only non-identity step is the weight-norm re-decomposition g=||w||, v=w,
which reconstructs w exactly up to one fp32 rounding). Also covers the
CLI leg: a stage-1 checkpoint exported to an HF snapshot loads with
`from_pretrained` and matches the trained encoder's layer-mean.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wav2vec_contr_loss_tpu.models.export_hf import (  # noqa: E402
    export_hf_state_dict, hf_config_from, save_hf_checkpoint)
from wav2vec_contr_loss_tpu.models.hf_convert import (  # noqa: E402
    config_from_hf, convert_hf_state_dict)

SMALL_KW = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
    attention_dropout=0.0, activation_dropout=0.0, feat_proj_dropout=0.0,
    layerdrop=0.0, vocab_size=32,
)


def make_hf(variant: str):
    if variant == "xlsr":
        cfg = transformers.Wav2Vec2Config(
            do_stable_layer_norm=True, feat_extract_norm="layer",
            conv_bias=True, **SMALL_KW)
    else:
        cfg = transformers.Wav2Vec2Config(
            do_stable_layer_norm=False, feat_extract_norm="group",
            conv_bias=False, **SMALL_KW)
    torch.manual_seed(0)
    return transformers.Wav2Vec2Model(cfg).eval()


@pytest.mark.parametrize("variant", ["xlsr", "large960h"])
def test_roundtrip_forward_parity(variant, tmp_path):
    src = make_hf(variant)
    cfg = config_from_hf(src.config).with_(dtype=jnp.float32)
    params = convert_hf_state_dict(src.state_dict(), cfg)

    out = str(tmp_path / "hf")
    save_hf_checkpoint(out, cfg, params)
    back = transformers.Wav2Vec2Model.from_pretrained(out).eval()

    wave = torch.from_numpy(
        np.random.default_rng(0).normal(0, 0.2, (2, 2000)).astype(np.float32))
    with torch.no_grad():
        a = src(wave).last_hidden_state.numpy()
        b = back(wave).last_hidden_state.numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_exported_state_dict_values_match(tmp_path):
    src = make_hf("xlsr")
    cfg = config_from_hf(src.config).with_(dtype=jnp.float32)
    params = convert_hf_state_dict(src.state_dict(), cfg)
    tmpl = src.state_dict()
    sd = export_hf_state_dict(cfg, params, tmpl.keys())
    for k, v in sd.items():
        want = tmpl[k].detach().numpy()
        got = np.asarray(v)
        assert got.shape == want.shape, k
        # weight-norm g/v: re-decomposed, equal to ~1 ulp; rest exact
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    # every template key is covered (masked_spec_embed is optional)
    missing = set(tmpl.keys()) - set(sd.keys()) - {"masked_spec_embed"}
    assert not missing


def test_fused_qkv_params_export_identically(tmp_path):
    """A fused-qkv converted tree must export the same q/k/v weights as
    the unfused tree."""
    src = make_hf("xlsr")
    base_cfg = config_from_hf(src.config).with_(dtype=jnp.float32)
    fused_cfg = base_cfg.with_(fused_qkv=True)
    tmpl = src.state_dict()
    sd_plain = export_hf_state_dict(
        base_cfg, convert_hf_state_dict(tmpl, base_cfg), tmpl.keys())
    sd_fused = export_hf_state_dict(
        fused_cfg, convert_hf_state_dict(tmpl, fused_cfg), tmpl.keys())
    for k in sd_plain:
        np.testing.assert_array_equal(sd_plain[k], sd_fused[k], err_msg=k)


def test_quantized_export_rejected():
    src = make_hf("xlsr")
    cfg = config_from_hf(src.config).with_(dtype=jnp.float32, quant="w8")
    with pytest.raises(ValueError, match="quantized"):
        export_hf_state_dict(cfg, {}, [])


def test_cli_exports_stage1_checkpoint(tmp_path):
    """Stage-1 ckpt -> export_hf_checkpoint CLI -> from_pretrained; the
    torch model's layer-mean matches the JAX encoder's on the same
    input."""
    import jax

    from wav2vec_contr_loss_tpu.cli import export_hf_checkpoint
    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder
    from wav2vec_contr_loss_tpu.train import checkpoint as ckpt
    from wav2vec_contr_loss_tpu.train.stage1 import Stage1Trainer

    src_model = make_hf("xlsr")
    enc_cfg = config_from_hf(src_model.config).with_(dtype=jnp.float32)
    enc_params = convert_hf_state_dict(src_model.state_dict(), enc_cfg)

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32",
                       seed=0)
    trainer = Stage1Trainer(cfg, enc_config=enc_cfg, enc_params=enc_params)
    state = trainer.init_state()
    save = str(tmp_path / "s1")
    ckpt.save_checkpoint(save, "best", state, cfg.ckpt_config(),
                         {"epoch": 0}, trainer._sidecar_extra())

    out = str(tmp_path / "hf_out")
    export_hf_checkpoint.main(["--src", save, "--name", "best",
                               "--out", out])
    back = transformers.Wav2Vec2Model.from_pretrained(out).eval()

    wave_np = np.random.default_rng(1).normal(0, 0.2, (2, 2000)
                                              ).astype(np.float32)
    enc = Wav2Vec2Encoder(enc_cfg)
    jax_out = enc.apply({"params": enc_params}, jnp.asarray(wave_np),
                        deterministic=True)["last_hidden"]
    with torch.no_grad():
        torch_out = back(torch.from_numpy(wave_np)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(jax_out), torch_out,
                               rtol=2e-4, atol=2e-5)
