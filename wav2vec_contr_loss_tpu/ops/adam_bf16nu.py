"""AdamW with reduced-precision SECOND-moment storage (capability knob).

The r3 profile at the 149.2 clips/s default recipe (docs/PROFILE_r3.md)
attributes ~14% of step time to f32 fusions over the stacked encoder
parameters — grads + Adam state + params read/written once per step. The
first moment already stores in bf16 (`adam_mu_dtype`, r2, default); this
transform extends the same treatment to `nu`, halving its ~1.26 GB fp32
footprint for the 315M-param encoder (~630 MB freed).

Math stays fp32: both moments are upcast before the exponential-moving-
average update and the rsqrt step-size computation; only the STORAGE dtype
drops. The bf16 mantissa (8 bits) bounds the relative nu error at ~0.4%,
i.e. ~0.2% on the sqrt step scale — measured against fp32 Adam in
tests/test_adam_bf16nu.py. ADOPTED AS THE CONFIG DEFAULT in r3
(`adam_nu_dtype='bfloat16'`, measured +0.9%: 149.2 -> 150.5 clips/s);
`adam_nu_dtype='float32'` restores the reference's exact AdamW
step-scale in one flag (the reference keeps everything fp32,
train_stage1.py:93-96). PARITY.md deviation #7.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["adamw_storage_dtypes"]


def _scale_by_adam_storage(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """optax.scale_by_adam semantics with independent mu/nu storage dtypes.

    Matches optax.scale_by_adam bit-for-bit when both dtypes are None
    (tested); with a reduced dtype, EMA math runs fp32 and only the stored
    state is down-cast."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        f32 = jnp.float32
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)

        def per_leaf(g, m, v):
            # ONE pass per leaf: EMA + bias-corrected step + storage
            # down-cast in a single fusable computation. Three separate
            # tree_maps would materialize full f32 copies of both moment
            # trees in HBM between phases — +2.5 GB peak for the stacked
            # 315M-param encoder leaves, measured as the difference
            # between fitting and OOM-by-2.4G at the bs=64 recipe. Here
            # the f32 m32/v32 exist only inside the fused kernel.
            g32 = g.astype(f32)
            m32 = b1 * m.astype(f32) + (1 - b1) * g32
            v32 = b2 * v.astype(f32) + (1 - b2) * jnp.square(g32)
            # update stays f32 even for reduced-precision grads (it feeds
            # weight decay + the f32 master-param apply); for f32 grads
            # this is the identity cast optax itself performs
            out = ((m32 / bc1) /
                   (jnp.sqrt(v32 / bc2 + eps_root) + eps)).astype(f32)
            return (out,
                    m32.astype(mu_dtype) if mu_dtype else m32,
                    v32.astype(nu_dtype) if nu_dtype else v32)

        triples = jax.tree_util.tree_map(per_leaf, updates, state.mu,
                                         state.nu)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda t: t[i], triples, is_leaf=is_triple)
        return pick(0), optax.ScaleByAdamState(
            count=count, mu=pick(1), nu=pick(2))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_storage_dtypes(
    learning_rate,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
    force_core: bool = False,
) -> optax.GradientTransformation:
    """AdamW with independent storage dtypes for both moments.

    nu_dtype=None delegates to stock optax.adamw (mu_dtype passthrough) so
    the default path is exactly what r2 measured; nu_dtype=bf16 swaps in
    the storage-dtype Adam core with the same decay/schedule plumbing.
    force_core=True always uses the storage-dtype core — required for
    reduced-precision gradients (`grad_dtype='bfloat16'`), where stock
    optax would run the EMA math in the gradient dtype instead of fp32."""
    if nu_dtype is None and not force_core:
        return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mu_dtype=mu_dtype)
    return optax.chain(
        _scale_by_adam_storage(b1=b1, b2=b2, eps=eps,
                               mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
