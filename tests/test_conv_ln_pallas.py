"""Fused conv-extractor LayerNorm+GELU kernel vs the flax/XLA reference
path (interpret mode on CPU, compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.ops.conv_ln_pallas import fused_ln_gelu


def _xla_ref(x, scale, bias, eps, gelu):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if gelu:
        h = jax.nn.gelu(h, approximate=False)
    return h.astype(x.dtype)


@pytest.mark.parametrize("gelu", [True, False])
@pytest.mark.parametrize("shape", [(2, 300, 512), (3, 257, 128)])
def test_fwd_matches_xla(shape, gelu):
    # 300/257 rows force a partial final grid block (ROWS=256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.2, shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.3, shape[-1]).astype(np.float32))
    got = fused_ln_gelu(x, scale, bias, 1e-5, gelu)
    want = _xla_ref(x, scale, bias, 1e-5, gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_xla(dtype):
    rng = np.random.default_rng(1)
    shape = (2, 300, 256)
    x = jnp.asarray(rng.normal(0, 2, shape)).astype(dtype)
    scale = jnp.asarray(rng.normal(1, 0.2, shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.3, shape[-1]).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_ln_gelu(x, s, b, 1e-5, True)
                       .astype(jnp.float32) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_xla_ref(x, s, b, 1e-5, True)
                       .astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 \
        else dict(rtol=1e-4, atol=1e-4)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32), **tol)


def test_encoder_conv_ln_pallas_matches_xla():
    """Whole-encoder forward parity between conv_ln_impl variants."""
    from wav2vec_contr_loss_tpu.models.wav2vec2 import (
        Wav2Vec2Config, Wav2Vec2Encoder)

    cfg = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False,
    )
    rng = np.random.default_rng(2)
    wave = jnp.asarray(rng.normal(0, 0.2, (2, 2000)).astype(np.float32))
    params = Wav2Vec2Encoder(cfg).init(jax.random.PRNGKey(0), wave)
    # identical param tree across impls (checkpoint compatibility)
    p2 = Wav2Vec2Encoder(cfg.with_(conv_ln_impl="pallas")).init(
        jax.random.PRNGKey(0), wave)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    a = Wav2Vec2Encoder(cfg).apply(params, wave)["layer_mean"]
    b = Wav2Vec2Encoder(cfg.with_(conv_ln_impl="pallas")).apply(
        params, wave)["layer_mean"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
