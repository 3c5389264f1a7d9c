"""Fused attention kernel: exactness vs the XLA formulation (dropout off),
deterministic hardware-PRNG dropout, VJP correctness (analytic + finite
differences), and encoder integration parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.ops.attention_pallas import fused_attention


def xla_reference(q, k, v, bias):
    """Mirrors the kernel's dtype choices (bf16 dots, fp32 softmax).
    q/k/v: (B, H, T, D); bias: (B, T)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    logits = logits + bias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def make_inputs(rng, b=2, h=3, t=40, d=16, masked_tail=7):
    q = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    bias = np.zeros((b, t), np.float32)
    bias[-1, -masked_tail:] = -1e30
    return q, k, v, bias, bias, h


def test_forward_matches_xla(rng):
    q, k, v, bias, bias_bh, h = make_inputs(rng)
    got = np.asarray(fused_attention(q, k, v, bias, 0, 0.0, h))
    want = np.asarray(xla_reference(q, k, v, bias))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-2)


def test_grads_match_xla(rng):
    q, k, v, bias, bias_bh, h = make_inputs(rng)

    def f_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, 0, 0.0, h) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(xla_reference(q, k, v, bias) ** 2)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2, rtol=5e-2)


def test_dropout_determinism_and_rate(rng):
    q, k, v, bias, _, h = make_inputs(rng, t=64)
    o1 = np.asarray(fused_attention(q, k, v, bias, 42, 0.5, h))
    o2 = np.asarray(fused_attention(q, k, v, bias, 42, 0.5, h))
    np.testing.assert_array_equal(o1, o2)  # same seed -> same mask
    o3 = np.asarray(fused_attention(q, k, v, bias, 43, 0.5, h))
    assert not np.allclose(o1, o3)         # different seed -> different mask
    # E[dropout(p)] == p  =>  mean output close to no-dropout output
    outs = [np.asarray(fused_attention(q, k, v, bias, s, 0.5, h))
            for s in range(24)]
    base = np.asarray(fused_attention(q, k, v, bias, 0, 0.0, h))
    err = np.abs(np.mean(outs, axis=0) - base).mean() / np.abs(base).mean()
    assert err < 0.25


def np_murmur_mask(shape, seed, rate):
    """numpy replica of the kernel's counter-based bit generator."""
    r = np.arange(shape[0], dtype=np.uint32)[:, None] * np.uint32(0)
    r = (np.arange(shape[0], dtype=np.uint32)[:, None]
         * np.uint32(2654435761)) * np.ones((1, shape[1]), np.uint32)
    c = np.ones((shape[0], 1), np.uint32) * (
        np.arange(shape[1], dtype=np.uint32)[None, :] * np.uint32(0x9E3779B9)
    )
    with np.errstate(over="ignore"):
        h = r ^ c
        h = h ^ (np.uint32(seed) * np.uint32(2246822519) + np.uint32(0x85EBCA6B))
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return np.where(h >= threshold, 1.0 / (1.0 - rate), 0.0).astype(np.float32)


def test_dropout_forward_and_vjp_exact_mask(rng):
    """The kernel's dropout mask is reproducible in numpy, so both the
    dropped forward and the custom VJP can be checked against an XLA mock
    using the exact same mask."""
    q, k, v, bias, _, h = make_inputs(rng, b=2, h=2, t=24, d=8,
                                      masked_tail=3)
    seed, rate = 7, 0.3
    b, hh, t, _ = q.shape
    # kernel seeding: seed + batch_idx * heads + head_idx
    masks = np.stack([
        np.stack([np_murmur_mask((t, t), seed + bi * hh + hi, rate)
                  for hi in range(hh)])
        for bi in range(b)
    ])  # (B, H, T, T)

    def xla_with_mask(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                            k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = logits + bias[:, None, None, :]
        p = jax.nn.softmax(logits, axis=-1) * masks
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    got = np.asarray(fused_attention(q, k, v, bias, seed, rate, h))
    want = np.asarray(xla_with_mask(q, k, v))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=3e-2)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, seed, rate, h) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_with_mask(q, k, v) ** 2)

    gp = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=6e-2, rtol=6e-2)


def test_encoder_integration_parity(rng):
    """attention_impl='pallas' (dropout off) must match the XLA encoder."""
    from tests.test_wav2vec2_parity import make_pair, make_input
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder

    _, cfg, params = make_pair("xlsr")
    wave = make_input(rng)
    want = Wav2Vec2Encoder(cfg).apply(params, wave)
    got = Wav2Vec2Encoder(cfg.with_(attention_impl="pallas")).apply(params, wave)
    np.testing.assert_allclose(
        np.asarray(got["layer_mean"]), np.asarray(want["layer_mean"]),
        atol=3e-3, rtol=3e-2,
    )
