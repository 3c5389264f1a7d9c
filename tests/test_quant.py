"""int8 quantized serving (ops/quant.py — beyond-reference capability).

Contract: QuantDense reproduces the fp32 Dense within int8 quantization
error bounds; quantize_encoder_params rewrites exactly the transformer
Dense subtrees; and the quantized SpoofScorer preserves the scoring
behavior of the fp32 scorer (rank correlation + EER) on a trained tiny
model. The reference has no quantized path (fp32 torch end-to-end) —
this is opt-in, serving-only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from wav2vec_contr_loss_tpu.ops.quant import (
    QuantDense, quantize_encoder_params, QUANT_TARGETS)

TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
    conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, dtype=jnp.float32,
    apply_spec_augment=False,
)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("mode", ["w8a8", "w8"])
def test_quant_dense_close_to_exact(mode):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32) * 0.2
    b = rng.normal(size=(48,)).astype(np.float32) * 0.1
    x = rng.normal(size=(4, 10, 64)).astype(np.float32)

    from wav2vec_contr_loss_tpu.ops.quant import _quantize_dense

    qp = _quantize_dense({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
    assert qp["kernel"].dtype == jnp.int8
    assert qp["scale"].shape == (48,)

    mod = QuantDense(48, dtype=jnp.float32, mode=mode)
    got = mod.apply({"params": qp}, jnp.asarray(x))
    want = x @ w + b
    # int8 symmetric quantization: per-element relative error ~1/127 on
    # the weights (+ activations for w8a8)
    bound = 0.03 if mode == "w8a8" else 0.015
    assert _rel_err(got, want) < bound


def test_quantize_encoder_params_targets_only_transformer_denses():
    enc = Wav2Vec2Encoder(TINY_ENC)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                      jnp.ones((1, 8000), jnp.int32))["params"]
    q = quantize_encoder_params(params)

    n_q = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(q):
        keys = [getattr(k, "key", k) for k in path]
        in_target = any(k in QUANT_TARGETS for k in keys)
        if in_target and keys[-1] == "kernel":
            assert leaf.dtype == jnp.int8, keys
            n_q += 1
        elif keys[-1] == "kernel":  # conv tower, pos-conv, feature proj
            assert leaf.dtype == jnp.float32, keys
    assert n_q == 6  # stacked: 4 attention + 2 FF
    # scales exist and are stacked over the layer axis
    att_q = q["layers"]["layer"]["attention"]["q_proj"]
    assert att_q["scale"].shape == (2, 32)
    # fp32 source tree untouched elsewhere
    np.testing.assert_array_equal(
        np.asarray(q["feature_projection"]["projection"]["kernel"]),
        np.asarray(params["feature_projection"]["projection"]["kernel"]))


@pytest.mark.parametrize("mode", ["w8a8", "w8"])
def test_quantized_encoder_forward_close(mode):
    enc = Wav2Vec2Encoder(TINY_ENC)
    rng = np.random.default_rng(1)
    wave = rng.normal(0, 0.2, (2, 8000)).astype(np.float32)
    wave[:, 6000:] = 0.0
    attn = (wave != 0.0).astype(np.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(wave),
                      jnp.asarray(attn))["params"]
    want = enc.apply({"params": params}, jnp.asarray(wave),
                     jnp.asarray(attn))["layer_mean"]

    qenc = Wav2Vec2Encoder(TINY_ENC.with_(quant=mode))
    q = quantize_encoder_params(params)
    got = qenc.apply({"params": q}, jnp.asarray(wave),
                     jnp.asarray(attn))["layer_mean"]
    assert _rel_err(got, want) < (0.05 if mode == "w8a8" else 0.02)


def test_quantized_scorer_preserves_scoring(tmp_path):
    """End-to-end: a trained tiny scorer quantized to int8 keeps the score
    ranking (corr > 0.98) and the EER within one-trial granularity."""
    from wav2vec_contr_loss_tpu.config import Stage1Config, Stage2Config
    from wav2vec_contr_loss_tpu.data import (
        AudioConfig, BatchPipeline, parse_asvspoof2019)
    from wav2vec_contr_loss_tpu.data.audio import write_wav
    from wav2vec_contr_loss_tpu.eval.metrics import compute_eer
    from wav2vec_contr_loss_tpu.eval.serving import SpoofScorer
    from wav2vec_contr_loss_tpu.train import Stage1Trainer, train_stage2

    SR = 16000
    rng = np.random.default_rng(2)
    lines = []
    for i in range(16):
        name = f"c{i:03d}.wav"
        bona = i % 2 == 0
        x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(SR) / SR) if bona
             else 0.2 * rng.standard_normal(SR))
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        lines.append(f"d/{name} {'-' if bona else 'A01'} "
                     f"{'bonafide' if bona else 'spoof'} - S{i % 3}")
    (tmp_path / "p.txt").write_text("\n".join(lines) + "\n")
    ds = parse_asvspoof2019(str(tmp_path / "p.txt"), str(tmp_path),
                            audio=AudioConfig(SR, 1))

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32",
                       seed=0)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=str(tmp_path / "s1"))
    embs, labels = trainer.embed_dataset(state, pipe)
    cfg2 = Stage2Config(epochs=10, batch_size=16, lr=5e-2, seed=0)
    head_params, _ = train_stage2(cfg2, embs, labels, embs, labels,
                                  save_dir=str(tmp_path / "s2"))

    f32 = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                       str(tmp_path / "s2"))
    sf, lab = f32.score_dataset(pipe)
    for mode in ("w8", "w8a8"):
        q = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                         str(tmp_path / "s2"),
                                         quantize=mode)
        sq, labq = q.score_dataset(pipe)
        np.testing.assert_array_equal(lab, labq)
        assert np.corrcoef(sf, sq)[0, 1] > 0.98, mode
        eer_f = compute_eer(sf[lab == 1], sf[lab == 0])[0]
        eer_q = compute_eer(sq[lab == 1], sq[lab == 0])[0]
        assert abs(eer_q - eer_f) <= 0.125 + 1e-9, mode
