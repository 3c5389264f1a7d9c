"""Fused self-attention Pallas kernel: logits -> masked softmax ->
dropout -> AV, entirely VMEM-resident, with a recompute (flash-style)
custom VJP.

Why: profiling the XLS-R finetune step showed attention-probs dropout
costing ~35% of the step (86 -> 130 clips/s with it disabled) — not the
RNG math itself, but the (B, H, T, T) fp32 probabilities materializing
through HBM several times per layer (fwd + the remat backward). At this
model's T=249 the whole per-batch working set — q/k/v (H,T,64) bf16,
one (T,T) fp32 logits panel at a time — fits VMEM, so the kernel runs one
program per *batch element* with a static loop over heads (one program per
(batch, head) leaves the MXU idle behind per-program pipeline overhead at
these tiny block sizes).

Dropout bits come from a counter-based in-kernel generator (murmur3
finalizer, see _random_bits), seeded per (program, head) so the backward
pass regenerates the identical mask instead of storing it.

Backward (residuals: q, k, v, bias, seed — probabilities recomputed):
    dv = p_dropᵀ g
    dp = g vᵀ  (through dropout: dp *= mask)
    ds = p ⊙ (dp − Σ_k dp ⊙ p)          # softmax VJP
    dq = ds k,   dk = dsᵀ q

Semantics: same masked-softmax attention as the XLA path; the dropout
stream differs from flax's threefry (different RNG — dropout parity is
statistical by nature, as it already is vs the torch reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention"]


def _probs(q, k, bias):
    logits = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias  # (T, T) + (1, T) broadcast: -1e30 on masked keys
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _random_bits(shape, seed):
    """Counter-based in-kernel bit generator (murmur3 finalizer over
    (row, col, seed)): deterministic given the seed — the backward kernel
    regenerates the identical mask — VMEM-resident, and identical across
    TPU-compiled and CPU-interpreted execution (pltpu.prng_* has no CPU
    interpreter lowering). Dropout needs decorrelated bits, not
    cryptographic ones; the finalizer's avalanche is plenty."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (r * jnp.uint32(2654435761)) ^ (c * jnp.uint32(0x9E3779B9))
    h = h ^ (seed.astype(jnp.uint32) * jnp.uint32(2246822519) + jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _dropout_mask(shape, rate: float, seed):
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    keep = _random_bits(shape, seed) >= threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


def _head_seed(seed_ref, heads: int, h: int):
    return seed_ref[0] + pl.program_id(0) * heads + h


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, rate,
                heads):
    bias = bias_ref[pl.ds(pl.program_id(0), 1), :]       # (1, T)
    for h in range(heads):  # static unroll: big blocks, one program/batch
        p = _probs(q_ref[0, h], k_ref[0, h], bias)
        if rate > 0.0:
            p = p * _dropout_mask(p.shape, rate, _head_seed(seed_ref, heads, h))
        o_ref[0, h] = jnp.dot(
            p.astype(jnp.bfloat16), v_ref[0, h].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                dq_ref, dk_ref, dv_ref, *, rate, heads):
    bias = bias_ref[pl.ds(pl.program_id(0), 1), :]
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h].astype(jnp.bfloat16)
        g = g_ref[0, h].astype(jnp.bfloat16)
        p = _probs(q, k, bias)
        if rate > 0.0:
            mask = _dropout_mask(p.shape, rate, _head_seed(seed_ref, heads, h))
            p_drop = p * mask
        else:
            mask = None
            p_drop = p
        dv = jax.lax.dot_general(  # p_dropᵀ g
            p_drop.astype(jnp.bfloat16), g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # g vᵀ
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            dp = dp * mask
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = ds.astype(jnp.bfloat16)
        dq = jnp.dot(ds16, k.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(  # dsᵀ q
            ds16, q.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _blk(heads, t, d):
    return pl.BlockSpec((1, heads, t, d), lambda i, s: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _call(kernel, out_shapes, out_specs, tensors, bias, seed, *, heads):
    b, h, t, d = tensors[0].shape
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_blk(h, t, d) for _ in tensors]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # bias (B,T) whole
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), *tensors, bias)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, bias, seed, rate: float = 0.0,
                    heads: int = 1):
    """q, k, v: (B, H, T, D); bias: (B, T) additive key mask (-1e30 masked);
    seed: int32 scalar; rate/heads static. -> (B, H, T, D).
    q must arrive pre-scaled (1/sqrt(D))."""
    return _fwd(q, k, v, bias, seed, rate, heads)[0]


def _fwd(q, k, v, bias, seed, rate, heads):
    b, h, t, d = q.shape
    out = _call(
        partial(_fwd_kernel, rate=rate, heads=h),
        jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        _blk(h, t, d),
        (q, k, v), bias, seed, heads=h,
    )
    return out, (q, k, v, bias, seed)


def _bwd(rate, heads, res, g):
    q, k, v, bias, seed = res
    b, h, t, d = q.shape
    dq, dk, dv = _call(
        partial(_bwd_kernel, rate=rate, heads=h),
        (jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
         jax.ShapeDtypeStruct((b, h, t, d), k.dtype),
         jax.ShapeDtypeStruct((b, h, t, d), v.dtype)),
        (_blk(h, t, d), _blk(h, t, d), _blk(h, t, d)),
        (q, k, v, g), bias, seed, heads=h,
    )
    return dq, dk, dv, None, None


fused_attention.defvjp(_fwd, _bwd)
