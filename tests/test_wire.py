"""int16 waveform wire format (ops/wire.py).

Contract: PCM-sourced unresampled audio round-trips EXACTLY (decoder
scale /32768); arbitrary floats re-quantize within 1/65536 with PCM-style
saturation; a train step fed an int16-wire batch of PCM-representable
audio is BIT-IDENTICAL to the float32-wire step; serving scores match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.ops.wire import (WIRE_SCALE, dequantize_wire,
                                             quantize_wire)


def test_pcm_roundtrip_exact():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=(4, 1000), dtype=np.int16)
    decoded = pcm.astype(np.float32) / WIRE_SCALE  # data/audio.py scale
    wire = quantize_wire(decoded)
    np.testing.assert_array_equal(wire, pcm)
    back = np.asarray(dequantize_wire(jnp.asarray(wire)))
    np.testing.assert_array_equal(back, decoded)


def test_float_requantization_bounded_and_saturating():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0, size=(8, 512)).astype(np.float32)
    back = np.asarray(dequantize_wire(jnp.asarray(quantize_wire(x))))
    # 1 LSB bound (0.5 LSB rounding, up to 1 LSB for the near-zero clamp)
    assert np.abs(back - x).max() <= 1.0 / WIRE_SCALE + 1e-9
    # out-of-range saturates like PCM, never wraps
    loud = np.array([[2.0, -2.0, 1.0, -1.0]], np.float32)
    w = quantize_wire(loud)
    np.testing.assert_array_equal(w, [[32767, -32768, 32767, -32768]])


def test_nonzero_set_preserved_for_tiny_samples():
    """Structural property behind the `wave != 0` attention-mask quirk:
    quantization must preserve the zero-set exactly in both directions.
    Plain rounding would zero any |x| < 0.5/32768 (possible after
    resampling), silently shortening the encoder's computed attention
    length — the review-caught failure mode this clamp prevents."""
    tiny = np.array([[1e-9, -1e-9, 1e-6, -1e-6, 0.0, 0.4]], np.float32)
    w = quantize_wire(tiny)
    np.testing.assert_array_equal(w != 0, tiny != 0)
    back = np.asarray(dequantize_wire(jnp.asarray(w)))
    np.testing.assert_array_equal(back != 0, tiny != 0)
    # the clamp costs at most 1 LSB of amplitude
    assert np.abs(back - tiny).max() <= 1.0 / WIRE_SCALE


def test_zero_padding_stays_zero():
    """The reference's `wave != 0` attention-mask quirk must be unaffected:
    zero padding is exactly zero through the wire."""
    x = np.zeros((2, 64), np.float32)
    x[0, :8] = 0.25
    w = quantize_wire(x)
    assert (w[0, 8:] == 0).all() and (w[1] == 0).all()
    back = np.asarray(dequantize_wire(jnp.asarray(w)))
    assert (back[0, 8:] == 0.0).all()


@pytest.fixture(scope="module")
def tiny_trainer():
    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
    from wav2vec_contr_loss_tpu.train import Stage1Trainer

    enc = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False)
    cfg = Stage1Config(batch_size=4, max_duration_seconds=1,
                       target_sample_rate=4000, input_dim=32, hidden_dim=16,
                       finetune_encoder=True, use_rawboost=False,
                       compute_dtype="float32")
    tr = Stage1Trainer(cfg, enc_config=enc)
    return tr, tr.init_state(jax.random.PRNGKey(0))


def test_train_step_bit_identical_on_pcm_input(tiny_trainer):
    """int16-wire vs float32-wire train step on PCM-representable audio:
    dequantize reproduces the identical f32 tensor, so losses and params
    must match bit-for-bit."""
    tr, st = tiny_trainer
    rng = np.random.default_rng(2)
    pcm = rng.integers(-8000, 8000, size=(4, 4000), dtype=np.int16)
    wave = pcm.astype(np.float32) / WIRE_SCALE
    labels = jnp.asarray([1, 0, 1, 0])
    alpha = jnp.zeros((), jnp.float32)

    b32 = {"waveforms": jnp.asarray(wave), "labels": labels,
           "multi_labels": labels}
    b16 = {"waveforms": jnp.asarray(quantize_wire(wave)), "labels": labels,
           "multi_labels": labels}
    # train_step donates its state: feed each call its own copy
    copy = lambda s: jax.tree_util.tree_map(jnp.copy, s)  # noqa: E731
    st32, m32 = tr.train_step(copy(st), b32, alpha)
    st16, m16 = tr.train_step(copy(st), b16, alpha)
    assert float(m32["loss"]) == float(m16["loss"])
    w32 = jax.tree_util.tree_leaves(st32.params)
    w16 = jax.tree_util.tree_leaves(st16.params)
    for a, b in zip(w32, w16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embed_step_accepts_wire(tiny_trainer):
    tr, st = tiny_trainer
    rng = np.random.default_rng(3)
    pcm = rng.integers(-8000, 8000, size=(4, 4000), dtype=np.int16)
    wave = pcm.astype(np.float32) / WIRE_SCALE
    z32 = np.asarray(tr.embed_step(st.params, st.frozen,
                                   {"waveforms": jnp.asarray(wave)}))
    z16 = np.asarray(tr.embed_step(
        st.params, st.frozen,
        {"waveforms": jnp.asarray(quantize_wire(wave))}))
    np.testing.assert_array_equal(z32, z16)
