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

# Environment markers that directly carry a coordinator address — their mere
# presence means some launcher wired up a multi-process run.
_COORDINATOR_MARKERS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)

_initialized = False


def _pod_hostnames_detected() -> bool:
    """True only when TPU_WORKER_HOSTNAMES names >= 2 distinct hosts.

    Cloud TPU pod slices export a comma-separated host list; a single-host
    container may export `TPU_WORKER_HOSTNAMES=localhost` (observed in the
    canonical bench environment), which must NOT trigger a distributed
    init — jax.distributed.initialize() without a coordinator address
    raises and would kill every CLI at startup.
    """
    raw = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    hosts = {h.strip() for h in raw.split(",") if h.strip()}
    return len(hosts) >= 2


def maybe_initialize(force: bool = False) -> bool:
    """Join the JAX distributed runtime when this looks like (or is forced
    to be) a multi-host launch. Idempotent; returns True when the runtime
    is (now) initialized."""
    global _initialized
    if _initialized:
        return True
    auto = any(os.environ.get(k) for k in _COORDINATOR_MARKERS) or \
        _pod_hostnames_detected()
    if not force and not auto:
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
            raise RuntimeError(
                "jax.distributed.initialize() failed on what looks like a "
                "genuine multi-host launch (coordinator marker or >=2 "
                "TPU_WORKER_HOSTNAMES). Failing fast: continuing "
                "single-host here would let EVERY pod host train on the "
                "full global batch and race checkpoint writes on the "
                "shared save_dir. Pass --multihost 0 to force a "
                "single-host run."
            ) from e
    except ValueError as e:
        # e.g. "coordinator_address should be defined". Detection is
        # strict (>=2 distinct hosts / explicit coordinator marker —
        # TPU_WORKER_HOSTNAMES=localhost never gets here), so a failure
        # means a real pod whose runtime is broken; a silent single-host
        # fallback would duplicate the run N times (each host with
        # process_index()==0, defeating the checkpoint process-0 gating).
        raise RuntimeError(
            "jax.distributed.initialize() failed on what looks like a "
            "genuine multi-host launch; refusing to silently fall back "
            "to single-host (duplicated runs would race on save_dir). "
            "Pass --multihost 0 to force a single-host run."
        ) from e
    _initialized = True
    return True


def add_multihost_arg(parser) -> None:
    """The shared --multihost CLI flag (one definition for every CLI)."""
    parser.add_argument(
        "--multihost", type=int, default=None, choices=[0, 1],
        help="force (1) / suppress (0) jax.distributed.initialize(); "
             "default auto-detects a pod launch (utils/distributed.py)")


def init_from_args(args) -> bool:
    """Apply the --multihost decision; call before any device use.
    Also enables the persistent compile cache: this runs exactly once at
    the start of every training/pipeline CLI, whether entered via the
    `python -m wav2vec_contr_loss_tpu` front door or as a cli.* module."""
    from .compile_cache import enable_compile_cache

    enable_compile_cache()
    if getattr(args, "multihost", None) == 0:
        return False
    return maybe_initialize(force=getattr(args, "multihost", None) == 1)
