"""Device mesh + sharding layout.

The reference's entire parallelism story is single-GPU DataParallel plus
dead NCCL scaffolding (reference: train_stage1.py:82-84,
stage1_utils.py:46-47/91-99/156-172 — never activated; SURVEY.md §2.7).
The TPU-native replacement is SPMD: one `jax.sharding.Mesh` with axes

  ('data', 'model')

where the balanced global batch is sharded over 'data' (XLA emits the
gradient all-reduce over ICI — the `_reduce_avg` equivalent is free, since
the jitted loss already averages over the global batch), and 'model'
optionally tensor-shards the transformer's attention heads and MLP
(XLS-R-300m fits replicated on one v5e chip, so model=1 is the default; the
axis exists for larger encoders / smaller chips).

Cross-host input: every process feeds its `jax.process_index()` slice of
the same global balanced batch (data/sampler.py 'global' mode) via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_sharding_rules",
           "shard_params", "shard_opt_state", "fetch_global"]


def fetch_global(x) -> np.ndarray:
    """Fetch a (possibly data-sharded) global array to host on EVERY
    process. Single-process / fully-addressable arrays are a plain
    np.asarray; arrays spanning hosts (multi-process 'data' sharding, e.g.
    per-row eval logits) go through `process_allgather` — np.asarray on
    those raises. Collective: under multi-process all processes must call
    this in the same order."""
    if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """2-D ('data', 'model') mesh over the available devices.

    Defaults to pure data parallelism over every device. 'model' consumes
    the innermost (fastest-ICI) axis of the device list so tensor-parallel
    collectives ride neighbor links.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if n_data is None:
        if total % n_model:
            raise ValueError(f"{total} devices not divisible by model={n_model}")
        n_data = total // n_model
    if n_data * n_model != total:
        raise ValueError(f"mesh {n_data}x{n_model} != {total} devices")
    return Mesh(devices.reshape(n_data, n_model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data' (batch dims of waveforms/labels)."""
    return NamedSharding(mesh, P("data"))


def global_batch_from_local(mesh: Mesh, local_arrays):
    """Assemble a global data-sharded batch from per-process local slices.

    Multi-host: each process feeds its `jax.process_index()` slice of the
    same deterministic global balanced batch (data/sampler.py 'global'
    mode); `jax.make_array_from_process_local_data` stitches the global
    array without any cross-host data movement. Single-process: a plain
    sharded device_put.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_arrays
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_arrays,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel layout for the scanned encoder layers (leading axis L is
# the scan axis, never sharded). Column-parallel qkv + up-projection,
# row-parallel out/down-projection => one psum per block, the Megatron
# layout expressed purely as shardings.
_TP_RULES = [
    (r".*attention/(q_proj|k_proj|v_proj|qkv_proj)/kernel$", P(None, None, "model")),
    (r".*attention/(q_proj|k_proj|v_proj|qkv_proj)/bias$", P(None, "model")),
    (r".*attention/out_proj/kernel$", P(None, "model", None)),
    (r".*feed_forward/intermediate_dense/kernel$", P(None, None, "model")),
    (r".*feed_forward/intermediate_dense/bias$", P(None, "model")),
    (r".*feed_forward/output_dense/kernel$", P(None, "model", None)),
]


def param_sharding_rules(path: str, ndim: int, tensor_parallel: bool) -> P:
    """PartitionSpec for a parameter, by its flattened path string."""
    if tensor_parallel:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                return spec
    return P()  # replicated


def _with_fsdp_axis(spec: P, shape, n_data: int) -> P:
    """Add 'data' sharding on the stacked-layer axis (axis 0) when it
    divides. Composes with TP specs — e.g. a stacked qkv kernel becomes
    P('data', None, 'model') (ZeRO-3 params + Megatron columns)."""
    if not shape or shape[0] % max(n_data, 1) or n_data <= 1:
        return spec
    rest = tuple(spec) + (None,) * (len(shape) - 1 - len(tuple(spec)))
    return P("data", *rest[1:]) if len(shape) > 1 else P("data")


def shard_params(params, mesh: Mesh, tensor_parallel: Optional[bool] = None,
                 fsdp: bool = False, pipeline: bool = False):
    """Apply the layout to a parameter pytree via device_put.

    fsdp=True additionally shards every scan-stacked encoder-layer
    parameter (paths under `layers/`, leading axis = the 24-layer stack)
    along 'data' — ZeRO-3 semantics: XLA all-gathers each layer's slice
    on use and reduce-scatters its gradient, and the optimizer state
    (mirroring the param tree) shrinks by the data-axis size per chip.
    Params whose leading dim doesn't divide the data axis stay on their
    base layout (the conv extractor / heads are small and replicated).

    pipeline=True shards the stacked layer params along 'model' instead —
    stage s of the GPipe executor (parallel/pipeline.py) owns rows
    [s*L/S, (s+1)*L/S), so placement doubles as the pipeline's stage
    layout. Implies tensor_parallel=False ('model' is the pipe axis);
    mutually exclusive with fsdp."""
    if pipeline:
        if fsdp:
            raise ValueError("pipeline and fsdp shard the layer stack on "
                             "different axes — pick one")
        tensor_parallel = False  # 'model' carries stages, not Megatron cols
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get("model", 1) > 1
    n_data = mesh.shape.get("data", 1)
    n_model = mesh.shape.get("model", 1)

    def path_str(kp):
        parts = []
        for p in kp:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    fsdp_hits = [0, 0]  # [stacked-layer params seen, actually sharded]

    def place(kp, leaf):
        path = path_str(kp)
        spec = param_sharding_rules(path, np.ndim(leaf), tensor_parallel)
        if fsdp and "layers/" in path:
            fsdp_hits[0] += 1
            new = _with_fsdp_axis(spec, np.shape(leaf), n_data)
            fsdp_hits[1] += new != spec
            spec = new
        if pipeline and "layers/" in path:
            shape = np.shape(leaf)
            if not shape or shape[0] % max(n_model, 1):
                raise ValueError(
                    f"pipeline: stacked param {path} leading dim "
                    f"{shape and shape[0]} does not divide the 'model' "
                    f"axis ({n_model} stages)")
            spec = P("model", *([None] * (len(shape) - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = jax.tree_util.tree_map_with_path(place, params)
    if fsdp and fsdp_hits[0] and not fsdp_hits[1]:
        # asked for ZeRO-3, got full replication — don't let that OOM
        # silently on a big model: the layer-stack size must divide 'data'
        import warnings

        warnings.warn(
            f"param_sharding='fsdp' sharded 0/{fsdp_hits[0]} stacked layer "
            f"params: the layer-stack leading dim does not divide the "
            f"'data' axis ({n_data}). Choose n_data dividing the layer "
            f"count (e.g. 2/4/8/12/24 for a 24-layer encoder) or params "
            f"stay fully replicated.", RuntimeWarning, stacklevel=2)
    return out


def shard_opt_state(opt_state, sharded_params, tx, mesh: Mesh):
    """Re-layout an EXISTING optimizer state to match sharded params.

    Values are preserved (this runs on checkpoint restore too — never
    re-initialize here); only the placement changes. An AOT
    lower+compile of `tx.init` over the already-sharded params yields
    the output SHARDINGS via GSPMD propagation WITHOUT executing — the
    old jit-and-run template materialized a full zero optimizer state on
    device (≈2x params for Adam) purely to read `.sharding`, a transient
    HBM spike that could OOM an XLS-R restore on a near-full chip.
    Param-independent leaves (e.g. the Adam step count) may come out on
    a sub-mesh and are replicated instead."""
    with mesh:
        shardings = jax.jit(tx.init).lower(sharded_params).compile() \
            .output_shardings
    mesh_devs = set(mesh.devices.flat)
    rep = NamedSharding(mesh, P())

    def adopt(sh, x):
        if sh is not None and set(sh.device_set) == mesh_devs:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(adopt, shardings, opt_state)
