"""Multi-host runtime initialization.

The SPMD input contract (data/sampler.py 'global' mode +
parallel/mesh.py `global_batch_from_local`) assumes every process joined
one JAX distributed runtime. On a TPU pod each host must call
`jax.distributed.initialize()` before first device use; single-host runs
must NOT call it (it would wait on a coordinator that never comes).

`maybe_initialize()` makes that decision explicit: initialize when the
caller passes `force=True` (the CLIs' `--multihost 1`) or when a
coordinator/pod environment is visibly present; stay a no-op otherwise.
This replaces the reference's dead `init_process_group` scaffolding
(reference: stage1_utils.py:91-99 — written for torch DDP, never
activated).
"""

from __future__ import annotations

import os

__all__ = ["maybe_initialize", "add_multihost_arg", "init_from_args"]

# Environment markers that indicate a multi-host launch. The first two are
# JAX's own coordinator plumbing; the TPU_* pair appear on Cloud TPU pod
# slices (one process per host).
_MARKERS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)

_initialized = False


def maybe_initialize(force: bool = False) -> bool:
    """Join the JAX distributed runtime when this looks like (or is forced
    to be) a multi-host launch. Idempotent; returns True when the runtime
    is (now) initialized."""
    global _initialized
    if _initialized:
        return True
    if not force and not any(os.environ.get(k) for k in _MARKERS):
        return False

    import jax

    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and already():
        _initialized = True  # a launcher beat us to it — fine
        return True
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # double-init from an external launcher without is_initialized():
        # jax raises "distributed.initialize should only be called once."
        msg = str(e).lower()
        if "once" not in msg and "already" not in msg:
            raise
    _initialized = True
    return True


def add_multihost_arg(parser) -> None:
    """The shared --multihost CLI flag (one definition for every CLI)."""
    parser.add_argument(
        "--multihost", type=int, default=None, choices=[0, 1],
        help="force (1) / suppress (0) jax.distributed.initialize(); "
             "default auto-detects a pod launch (utils/distributed.py)")


def init_from_args(args) -> bool:
    """Apply the --multihost decision; call before any device use."""
    if getattr(args, "multihost", None) == 0:
        return False
    return maybe_initialize(force=getattr(args, "multihost", None) == 1)
