"""Fused LayerNorm(+exact GELU) Pallas kernel for the conv feature
extractor.

Why: the extractor's per-conv LayerNorm+GELU chains run over huge early
activations ((B, 15999, 512) for 5 s clips) and profiling shows XLA
lowers them as several full-HBM passes each (stats, normalize, GELU, and
their backwards — ~16 ms/step of the bs=32 finetune recipe, the largest
non-MXU block after the transformer elementwise). One VMEM-resident
kernel does fwd in a single read+write, and bwd in two reads+one write
with the LN statistics recomputed on-chip (reference behavior being
fused: HF Wav2Vec2FeatureEncoder's LayerNorm+GELU pairs used via
/root/reference/encoder.py:21).

Layout: rows = flattened (B, T), channels = minor dim (C = 512 = 4x128
lanes). LN statistics are per-row over the minor dim — a lane reduction
the VPU does natively. Stats in fp32; IO in the compute dtype (bf16),
matching the XLA path's `_ConvLayerNorm` contract. dscale/dbias
accumulate across the sequential TPU grid in an fp32 VMEM scratch.

Exactness: same math as flax nn.LayerNorm (fp32 stats, biased variance,
rsqrt(var+eps)) followed by jax.nn.gelu(approximate=False); parity is
tested to bf16 rounding in tests/test_conv_ln_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln_gelu"]

_ROWS = 256          # rows per grid step: (256, 512) bf16 block = 256 KB
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — below the bf16 IO rounding of this kernel). Pallas TPU has
    no erf lowering, so the polynomial is spelled out."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(h):
    return 0.5 * h * (1.0 + _erf(h * _INV_SQRT2))


def _fwd_kernel(x_ref, sc_ref, b_ref, o_ref, *, eps, gelu):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps) * sc_ref[...] + b_ref[...]
    if gelu:
        h = _gelu(h)
    o_ref[...] = h.astype(o_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, sc_ref, b_ref, dx_ref, dsc_ref, db_ref,
                acc_ref, *, eps, gelu, n_rows, block_rows):
    g = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    rows = g * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0)
    valid = rows < n_rows
    # zero the padded tail rows BEFORE the statistics via select, not
    # multiply: compiled-TPU pad loads are undefined (observed NaN), and
    # 0 * NaN would still poison the dscale/dbias accumulators
    x = jnp.where(valid, x, 0.0)
    dy = jnp.where(valid, dy, 0.0)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    if gelu:
        h = xhat * sc_ref[...] + b_ref[...]
        phi = 0.5 * (1.0 + _erf(h * _INV_SQRT2))
        dh = dy * (phi + h * _INV_SQRT2PI * jnp.exp(-0.5 * h * h))
    else:
        dh = dy
    dh = jnp.where(valid, dh, 0.0)

    dxhat = dh * sc_ref[...]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    acc_ref[0:1, :] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(dh, axis=0, keepdims=True)

    @pl.when(g == last)
    def _flush():
        dsc_ref[...] = acc_ref[0:1, :]
        db_ref[...] = acc_ref[1:2, :]


def _rows_of(x):
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ln_gelu(x, scale, bias, eps: float = 1e-5, gelu: bool = True):
    """gelu(LayerNorm(x) * scale + bias) over the minor dim of (..., C).

    x: (..., C) in the compute dtype; scale/bias: (C,) fp32. Exact-erf
    GELU (gelu=False gives plain LN). Stats fp32, IO in x.dtype."""
    y, _ = _fwd(x, scale, bias, eps, gelu)
    return y


def _fwd(x, scale, bias, eps, gelu):
    c = x.shape[-1]
    n = _rows_of(x)
    x2 = x.reshape(n, c)
    grid = pl.cdiv(n, _ROWS)
    y = pl.pallas_call(
        partial(_fwd_kernel, eps=eps, gelu=gelu),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, c), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x2, scale.astype(jnp.float32)[None, :],
      bias.astype(jnp.float32)[None, :])
    return y.reshape(x.shape), (x, scale, bias)


def _bwd(eps, gelu, res, dy):
    x, scale, bias = res
    c = x.shape[-1]
    n = _rows_of(x)
    grid = pl.cdiv(n, _ROWS)
    dx, dsc, db = pl.pallas_call(
        partial(_bwd_kernel, eps=eps, gelu=gelu, n_rows=n,
                block_rows=_ROWS),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, c), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, c), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, c), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(n, c), dy.reshape(n, c),
      scale.astype(jnp.float32)[None, :], bias.astype(jnp.float32)[None, :])
    return (dx.reshape(x.shape), dsc[0].astype(scale.dtype),
            db[0].astype(bias.dtype))


fused_ln_gelu.defvjp(_fwd, _bwd)
