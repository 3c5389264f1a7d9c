"""GPipe-style pipeline parallelism over a stacked layer axis.

The reference has no pipeline story at all (its parallelism is a dead NCCL
DDP scaffold, reference: stage1_utils.py:156-172); this module completes the
TPU scaling surface for encoders too large to replicate per chip: the
scan-stacked transformer layers (leading axis L) are split into S contiguous
stages sharded over a mesh axis, microbatches flow stage-to-stage over ICI
via `lax.ppermute`, and XLA's AD of the forward schedule yields the reverse
pipeline automatically.

Design (scaling-book recipe, expressed as one SPMD program):

  * `jax.shard_map` runs MANUAL over the pipeline axis only (`axis_names=`);
    every other mesh axis (e.g. 'data') stays automatic, so data parallelism
    composes with pp without any code here knowing about it.
  * Stage s owns stacked-param rows [s*L/S, (s+1)*L/S) — exactly the local
    slice `P('model')` sharding hands it, so placement doubles as layout.
  * One `lax.scan` over M + S - 1 ticks; at tick t, stage s runs microbatch
    t - s (bubbles compute garbage that is never collected — the standard
    GPipe bubble, fraction (S-1)/(M+S-1)).
  * Per-tick hand-off is a single `ppermute` shift of the activation; the
    running layer-output sum the encoder needs for its K-state mean is NOT
    shipped around the ring — each stage accumulates its own layers' partial
    sums locally and one end-of-pipe `psum` combines them (same collective
    that also broadcasts the last stage's outputs to every stage for the
    data-parallel postamble).

Numerics match the `lax.scan` single-device stack to float tolerance (the
layer-sum adds in a different association order); exact-parity and gradient
tests live in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["gpipe_stack"]


def _stage_rows(stacked_params) -> int:
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if not leaves:
        raise ValueError("gpipe_stack: empty stacked_params")
    return leaves[0].shape[0]


def gpipe_stack(
    layer_fn: Callable[[Any, jnp.ndarray, Any, Optional[jnp.ndarray]], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    consts: Any,
    layer_rngs: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = "model",
    sum_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run L stacked layers as an S-stage pipeline over `mesh` axis `axis`.

    layer_fn(p_l, h, consts_mb, rng_l) -> h'
        one layer applied functionally to its param slice; `rng_l` is None
        when `layer_rngs` is None (deterministic mode).
    stacked_params: pytree, every leaf (L, ...); stage s gets rows
        [s*L/S, (s+1)*L/S) — shard these P(axis) for zero-copy entry.
    x:      (B, ...) input hidden states; any other mesh axes (data) stay
            automatic.
    consts: pytree of per-example tensors (B, ...) every layer reads
            (e.g. the attention key bias); microbatched alongside x.
    layer_rngs: (L, M) key array (or None) — per (layer, microbatch)
            dropout keys, so masks decorrelate across layers AND
            microbatches.
    n_micro: M microbatches; B % M == 0. More microbatches shrink the
            bubble (S-1)/(M+S-1) at the cost of smaller per-stage matmuls.

    Returns (h_last, layer_sum): the final layer's output and the sum of
    ALL L layer outputs (in `sum_dtype`), both (B, ...) and replicated over
    `axis` — the two quantities the encoder's K-state mean needs.
    """
    if axis not in mesh.shape:
        raise ValueError(f"gpipe_stack: mesh has no '{axis}' axis: {mesh.shape}")
    n_stages = mesh.shape[axis]
    n_layers = _stage_rows(stacked_params)
    if n_layers % n_stages:
        raise ValueError(
            f"gpipe_stack: {n_layers} layers not divisible by "
            f"{n_stages} pipeline stages")
    batch = x.shape[0]
    if batch % n_micro:
        raise ValueError(
            f"gpipe_stack: batch {batch} not divisible by n_micro={n_micro}")
    mb = batch // n_micro
    M, S = n_micro, n_stages

    def vary(a):
        # fresh zeros are axis-invariant; the tick carry varies per stage
        return jax.lax.pcast(a, (axis,), to="varying")

    def pipeline(params_local, x, consts, rngs_local):
        s = jax.lax.axis_index(axis)
        xq = x.reshape(M, mb, *x.shape[1:])
        cq = jax.tree_util.tree_map(
            lambda c: c.reshape(M, mb, *c.shape[1:]), consts)

        def run_stage(h, consts_mb, rngs_mb):
            """Apply this stage's local layers sequentially; also return the
            stage-local sum of layer outputs (for the K-state mean)."""
            def body(carry, xs):
                h, acc = carry
                if rngs_mb is None:
                    p_l = xs
                    h2 = layer_fn(p_l, h, consts_mb, None)
                else:
                    p_l, r_l = xs
                    h2 = layer_fn(p_l, h, consts_mb, r_l)
                return (h2, acc + h2.astype(sum_dtype)), None

            acc0 = vary(jnp.zeros(h.shape, sum_dtype))
            xs = params_local if rngs_mb is None else (params_local, rngs_mb)
            (h_out, acc), _ = jax.lax.scan(body, (h, acc0), xs)
            return h_out, acc

        perm = [(i, i + 1) for i in range(S - 1)]
        h_prev = vary(jnp.zeros((mb, *x.shape[1:]), x.dtype))
        out_h = vary(jnp.zeros((M, mb, *x.shape[1:]), x.dtype))
        out_sum = vary(jnp.zeros((M, mb, *x.shape[1:]), sum_dtype))

        def tick(carry, t):
            h_prev, out_h, out_sum = carry
            mb_id = jnp.clip(t - s, 0, M - 1)       # microbatch at this stage
            feed = jax.lax.dynamic_index_in_dim(     # stage 0's intake
                xq, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            h_in = jnp.where(s == 0, feed, h_prev)
            consts_mb = jax.tree_util.tree_map(
                lambda c: jax.lax.dynamic_index_in_dim(
                    c, mb_id, 0, keepdims=False), cq)
            rngs_mb = None if rngs_local is None else \
                jax.lax.dynamic_index_in_dim(rngs_local, mb_id, 1,
                                             keepdims=False)
            h_out, sum_out = run_stage(h_in, consts_mb, rngs_mb)

            valid = (t >= s) & (t - s < M)          # not a bubble tick
            cur_s = jax.lax.dynamic_index_in_dim(out_sum, mb_id, 0,
                                                 keepdims=False)
            out_sum = jax.lax.dynamic_update_index_in_dim(
                out_sum, jnp.where(valid, sum_out, cur_s), mb_id, 0)
            collect = valid & (s == S - 1)          # pipe exit
            cur_h = jax.lax.dynamic_index_in_dim(out_h, mb_id, 0,
                                                 keepdims=False)
            out_h = jax.lax.dynamic_update_index_in_dim(
                out_h, jnp.where(collect, h_out, cur_h), mb_id, 0)

            h_next = jax.lax.ppermute(h_out, axis, perm) if perm else h_out
            return (h_next, out_h, out_sum), None

        (h_prev, out_h, out_sum), _ = jax.lax.scan(
            tick, (h_prev, out_h, out_sum), jnp.arange(M + S - 1))

        # one collective closes the pipe: broadcast the last stage's outputs
        # and combine every stage's partial layer sums. psum rides f32:
        # a bf16 psum under partial-manual shard_map hard-crashes XLA CPU
        # ("Invalid binary instruction opcode copy", jax 0.9.0) — and the
        # f32 round trip is exact for the broadcast (every other stage
        # contributes zeros) and strictly more precise for the sums.
        def psum32(v):
            return jax.lax.psum(v.astype(jnp.float32), axis).astype(v.dtype)

        out_h = psum32(jnp.where(s == S - 1, out_h, jnp.zeros_like(out_h)))
        out_sum = psum32(out_sum)
        return (out_h.reshape(batch, *x.shape[1:]),
                out_sum.reshape(batch, *x.shape[1:]))

    # the rng spec binds zero leaves when layer_rngs is None
    return jax.shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis)),
        out_specs=(P(), P()),
        axis_names={axis},
    )(stacked_params, x, consts, layer_rngs)
