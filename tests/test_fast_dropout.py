"""Counter-hash dropout: distribution, determinism, scaling, and encoder
training-mode integration."""

import numpy as np

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.ops.fast_dropout import murmur_bits, murmur_dropout


def test_bits_uniformity_and_independence():
    bits = np.asarray(murmur_bits((256, 512), jnp.int32(123)))
    frac = (bits >= np.uint32(2 ** 31)).mean()
    assert abs(frac - 0.5) < 0.01
    # neighboring elements decorrelated (avalanche)
    col_corr = np.corrcoef(bits[:, :-1].ravel().astype(np.float64),
                           bits[:, 1:].ravel().astype(np.float64))[0, 1]
    row_corr = np.corrcoef(bits[:-1].ravel().astype(np.float64),
                           bits[1:].ravel().astype(np.float64))[0, 1]
    assert abs(col_corr) < 0.01 and abs(row_corr) < 0.01
    # different seeds -> different bits
    bits2 = np.asarray(murmur_bits((256, 512), jnp.int32(124)))
    assert (bits != bits2).mean() > 0.99


def test_dropout_semantics(rng):
    x = jnp.ones((64, 128), jnp.float32)
    key = jax.random.PRNGKey(0)
    for rate in (0.1, 0.5):
        y = np.asarray(murmur_dropout(x, key, rate))
        kept = y > 0
        assert abs(kept.mean() - (1 - rate)) < 0.03
        np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=1e-6)
        # deterministic per key
        np.testing.assert_array_equal(
            y, np.asarray(murmur_dropout(x, key, rate)))
    # rate 0 is the identity
    assert murmur_dropout(x, key, 0.0) is x


def test_encoder_murmur_training_mode(rng):
    from tests.test_wav2vec2_parity import make_pair, make_input
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder

    _, cfg, params = make_pair("xlsr")
    cfg = cfg.with_(dropout_impl="murmur", hidden_dropout=0.2,
                    attention_dropout=0.2, feat_proj_dropout=0.2)
    wave = make_input(rng)
    enc = Wav2Vec2Encoder(cfg)
    det = enc.apply(params, wave)
    aug = enc.apply(params, wave, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(5)})
    # dropout actually fires, deterministically per key, finite
    assert not np.allclose(np.asarray(det["layer_mean"]),
                           np.asarray(aug["layer_mean"]))
    aug2 = enc.apply(params, wave, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(5)})
    np.testing.assert_array_equal(np.asarray(aug["layer_mean"]),
                                  np.asarray(aug2["layer_mean"]))
    assert np.isfinite(np.asarray(aug["layer_mean"])).all()
