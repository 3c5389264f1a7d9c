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

__all__ = ["maybe_initialize"]

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

    jax.distributed.initialize()
    _initialized = True
    return True
