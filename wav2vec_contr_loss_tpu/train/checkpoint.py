"""Checkpointing: full train state via Orbax, config embedded as JSON.

Improves on the reference, which saves params-only best checkpoints with no
optimizer state and no resume path (reference: train_stage1.py:114-129,
SURVEY.md §5): here `save` persists the complete state (params + optimizer
+ epoch + PRNG key) so crashed runs resume exactly, and the embedded config
dict keeps the reference's reload contract (stage1_config.py:261-283 read
back by extract_stage1_embeddings.py:121-125).

Layout:  <dir>/<name>/   (orbax pytree)  +  <dir>/<name>.config.json
`keep_best` + `latest` naming mirrors the reference's best-by-dev-metric
policy while always retaining a resumable latest.

Multi-process semantics (ADVICE r2): every process participates in the
host fetch (`_host_tree` all-gathers process-sharded leaves — a collective),
but only process 0 touches the filesystem; a named barrier keeps processes
in step so no reader races the swap. Crash recovery (`_recover`) runs only
on the writer side — readers resolve a stranded `.saving`/`.replaced` copy
without renaming anything, so a polling eval process can never yank a
directory out from under an in-flight save.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "load_config",
           "load_sidecar", "checkpoint_exists", "alias_checkpoint",
           "wait_for_saves", "resume_cursor", "snapshot_for_save"]


def resume_cursor(metrics: Dict) -> "tuple[int, int]":
    """-> (start_epoch, skip_steps) from a 'latest' sidecar's metrics.

    A normal epoch-end save resumes at the NEXT epoch; a graceful
    preemption save (utils/preemption.py) carries a `batches_done` cursor
    and resumes the SAME epoch past it — the pipeline replays the
    sampler/augmentation stream deterministically (data/pipeline.py
    train_epoch(skip=...))."""
    if metrics.get("preempted"):
        return int(metrics["epoch"]), int(metrics["batches_done"])
    return int(metrics["epoch"]) + 1, 0


_CKPTR = None

# Single ordered writer thread for async saves (`block=False`). One worker
# means every enqueued save/alias commits in call order — the on-disk
# sequence is indistinguishable from blocking saves; only the caller's
# wall-clock changes. Threads are non-daemon, so a clean interpreter exit
# joins pending writes instead of tearing them (a crash mid-write falls
# into the same `.saving`/`.replaced` recovery as a crashed blocking save).
_WRITER = None
_PENDING: list = []


class _TornRead(RuntimeError):
    """A checkpoint directory was swapped out from under a reader."""


def _writer():
    global _WRITER
    if _WRITER is None:
        from concurrent.futures import ThreadPoolExecutor

        _WRITER = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="ckpt-writer")
    return _WRITER


def _raise_failed_saves() -> None:
    """Re-raise the first exception from a completed async save, pruning
    finished futures. Called on every checkpoint API entry so a failed
    background write can't be silently swallowed.

    One pass partitions _PENDING so a future whose done() flips between
    two scans can't fall through the crack (it would vanish from
    _PENDING unchecked — a lost ENOSPC); extra failures beyond the first
    are surfaced on stderr rather than dropped."""
    import sys

    global _PENDING
    done, pending = [], []
    for f in _PENDING:
        (done if f.done() else pending).append(f)
    _PENDING = pending
    errs = []
    for f in done:
        try:
            f.result()
        except BaseException as e:
            errs.append(e)
    if errs:
        for extra in errs[1:]:
            print(f"[checkpoint] additional async save failure: {extra!r}",
                  file=sys.stderr)
        raise errs[0]


def wait_for_saves() -> None:
    """Block until every `save_checkpoint(..., block=False)` and enqueued
    alias has committed; re-raises the first background failure.

    ALL pending futures are joined before raising — stopping at the first
    failure would drop the later futures from _PENDING while they are
    still executing, permanently swallowing their failures."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    first: Optional[BaseException] = None
    for f in pending:
        try:
            f.result()
        except BaseException as e:
            if first is None:
                first = e
    if first is not None:
        raise first


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _host_tree(tree):
    """Fetch a state tree to host memory on every process.

    Leaves sharded across processes (fsdp over a multi-host 'data' axis)
    are not fully addressable — `np.asarray` on them raises. Those leaves
    are materialized via `process_allgather` (a collective: ALL processes
    must call `_host_tree`, even the ones that won't write)."""
    from ..parallel.mesh import fetch_global

    return jax.tree_util.tree_map(fetch_global, tree)


def _is_primary() -> bool:
    return jax.process_index() == 0


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _remove(path: str) -> None:
    """Remove a checkpoint path whatever it is (dir, symlink, file)."""
    if os.path.islink(path) or os.path.isfile(path):
        os.remove(path)
    elif os.path.isdir(path):
        shutil.rmtree(path)


def _rename_with_sidecar(src: str, dst: str) -> None:
    os.rename(src, dst)
    if os.path.exists(src + ".config.json"):
        os.replace(src + ".config.json", dst + ".config.json")


def _recover(path: str) -> None:
    """WRITER-SIDE ONLY. Close the rename window: a crash between
    `os.rename(path, old)` and `os.rename(tmp, path)` leaves no `path` but
    one or two complete copies under the sibling names. Orbax commits its
    own writes atomically (an interrupted save leaves a
    `*.orbax-checkpoint-tmp-*` dir, never the plain `.saving` name), so a
    directory at `.saving` is a complete NEW state — prefer it; `.replaced`
    is the complete previous state. The matching sidecar (staged next to
    the state since ADVICE r2 fix #3) is adopted in the same rename, so a
    recovered checkpoint never pairs new params with a stale config."""
    tmp, old = path + ".saving", path + ".replaced"
    if os.path.exists(path):
        # a crash between the final state rename and the sidecar replace
        # strands the NEW sidecar at tmp+'.config.json' while `path`
        # already holds the new state (and its old sidecar moved to
        # `.replaced.config.json`): adopt the stranded sidecar before the
        # caller's stale-cleanup deletes the only copy. Guard: if a
        # complete `.saving` DIRECTORY also exists, `path` is the OLD
        # state and the tmp sidecar belongs to tmp — adopting would
        # mispair, so leave it for the normal no-path recovery to handle.
        if (not os.path.exists(path + ".config.json")
                and os.path.exists(tmp + ".config.json")
                and not os.path.isdir(tmp)):
            os.replace(tmp + ".config.json", path + ".config.json")
        return
    # a `.saving` dir WITHOUT its staged sidecar is an in-flight save
    # (Orbax finished, sidecar not yet written) — not adoptable: pairing
    # it with no/stale config is exactly what the staging prevents
    if (os.path.isdir(tmp) and not os.path.islink(tmp)
            and os.path.exists(tmp + ".config.json")):
        _rename_with_sidecar(tmp, path)
    elif os.path.isdir(old) and not os.path.islink(old):
        _rename_with_sidecar(old, path)


def _resolve_readable(path: str) -> Optional[str]:
    """READER-SIDE crash-window fallback: never renames. Returns the best
    complete copy of the checkpoint (`path` itself, else the stranded
    `.saving` new state, else the `.replaced` previous state), or None.

    A fallback candidate counts only WITH its staged sidecar: a sidecar-less
    `.saving` is an in-flight save (a poller would see exists()==True and
    then crash reading the missing config — review r3 finding)."""
    if os.path.isdir(path):
        return path
    for cand in (path + ".saving", path + ".replaced"):
        if os.path.isdir(cand) and os.path.exists(cand + ".config.json"):
            return cand
    return None


def _commit_save(path: str, directory: str, name: str, host_state: Any,
                 config: Optional[Dict], metrics: Optional[Dict],
                 extra: Optional[Dict]) -> None:
    """The writer-side filesystem section of a save: recover/cleanup,
    Orbax write to the `.saving` temp, staged sidecar, atomic-ish swap.
    Runs inline for blocking/multi-process saves; on the single writer
    thread for async saves (single-process only, so the `_barrier`s are
    no-ops there and Orbax has no collective to sync)."""
    tmp = path + ".saving"
    old = path + ".replaced"
    if _is_primary():
        os.makedirs(directory, exist_ok=True)
        _recover(path)  # adopt a complete copy stranded by a mid-swap crash
        for stale in (tmp, old):
            _remove(stale)
            _remove(stale + ".config.json")
    _barrier(f"ckpt-clean:{name}")  # cleanup done before anyone enters save
    c = _checkpointer()
    c.save(tmp, host_state)  # collective: every process must enter
    c.wait_until_finished()  # StandardCheckpointer saves asynchronously
    if _is_primary():
        # stage the sidecar NEXT TO the temp state so the swap (and any
        # crash recovery of it) moves them together
        sidecar = {"config": config or {}, "metrics": metrics or {},
                   "extra": extra or {}}
        with open(tmp + ".config.json", "w") as f:
            json.dump(sidecar, f, indent=2, default=str)
        if os.path.islink(path):  # was an alias (dev-less run): drop the link
            os.remove(path)
            if os.path.islink(path + ".config.json"):
                os.remove(path + ".config.json")
        elif os.path.exists(path):
            _rename_with_sidecar(path, old)
        _rename_with_sidecar(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
            _remove(old + ".config.json")
    _barrier(f"ckpt-save:{name}")


def snapshot_for_save(state: Any) -> Any:
    """One host snapshot of `state`, safe to pass as `host_state` to
    SEVERAL save_checkpoint calls (e.g. 'latest' + 'best' on a new-best
    epoch) — the fetch + defensive copy of a multi-GB state happens once
    instead of per save. Collective under multi-process (every process
    must call it, like save_checkpoint itself). The snapshot is owned by
    the caller and never mutated by the writer."""
    host = _host_tree(state)
    # decouple from donated device buffers (see save_checkpoint async path)
    return jax.tree_util.tree_map(lambda x: np.array(x, copy=True), host)


def save_checkpoint(directory: str, name: str, state: Any,
                    config: Optional[Dict] = None,
                    metrics: Optional[Dict] = None,
                    extra: Optional[Dict] = None, *,
                    block: bool = True,
                    host_state: Optional[Any] = None) -> str:
    """Write <directory>/<name>, crash-safe: the new state AND its sidecar
    are fully written to temp siblings before the previous checkpoint is
    touched, so a crash mid-save never destroys the existing
    'latest'/'best' and never splits a state from its config.

    `block=False` (single-process only) returns once the state is
    snapshotted to host memory and hands the Orbax write + swap to a
    single ordered writer thread, hiding the multi-GB disk write
    (~18-30 s at XLS-R-300m scale, measured) behind the next epoch's
    training. Saves and aliases commit strictly in call order; readers in
    this process (`restore_checkpoint`/`checkpoint_exists`/`load_sidecar`)
    drain the queue first, so read-after-write stays exact. A background
    failure re-raises on the next checkpoint call or `wait_for_saves()`.
    Under `jax.process_count() > 1` the call degrades to blocking — the
    Orbax save and the barriers are collectives that must stay on the
    main thread.

    Collective under multi-process: every process must call this. The host
    fetch all-gathers process-sharded leaves, and the Orbax `save` is
    ITSELF a multihost collective (AsyncCheckpointer syncs global processes
    internally — calling it on process 0 only mismatches its barrier names,
    found by the real 2-process smoke run, tests/test_multiprocess.py).
    Only process 0 touches the swap/cleanup filesystem state; Orbax's own
    primary-host logic keeps non-primary processes from writing array data.

    `config` is the reference-parity UPPERCASE dict; `extra` carries
    framework-side reload data (e.g. the encoder architecture dict).

    `host_state` (from snapshot_for_save) skips this call's own host
    fetch/copy — several saves of the SAME state can share one snapshot."""
    _raise_failed_saves()
    if host_state is None:
        host_state = _host_tree(state)  # collective — before process gate
        prefetched = False
    else:
        prefetched = True  # already a safe host copy (snapshot_for_save)
    path = os.path.abspath(os.path.join(directory, name))
    if block or jax.process_count() > 1:
        wait_for_saves()  # total order with any in-flight async writes
        _commit_save(path, directory, name, host_state,
                     config, metrics, extra)
    else:
        # Deep-copy the snapshot: on the CPU backend `np.asarray` of a
        # jax.Array can alias the XLA buffer, and the trainers donate
        # state buffers into the next step — the writer thread must never
        # read memory the device is free to reuse.
        snap = host_state if prefetched else jax.tree_util.tree_map(
            lambda x: np.array(x, copy=True), host_state)
        _PENDING.append(_writer().submit(
            _commit_save, path, directory, name, snap,
            config, metrics, extra))
    return path


def _commit_alias(directory: str, path: str, target: str) -> None:
    for suffix in ("", ".config.json"):
        dst = path + suffix
        src = target + suffix  # relative link inside the directory
        _remove(dst)
        try:
            os.symlink(src, dst)
        except OSError:
            full_src = os.path.join(directory, src)
            if os.path.isdir(full_src):
                shutil.copytree(full_src, dst)
            elif os.path.exists(full_src):
                shutil.copyfile(full_src, dst)


def alias_checkpoint(directory: str, name: str, target: str) -> str:
    """Make <directory>/<name> an alias (symlink) of <directory>/<target>.

    Used by dev-less training runs where no best-metric exists: 'best'
    tracks 'latest' without writing the state twice per epoch. Falls back
    to a real copy if the filesystem refuses symlinks. Process-0 only.
    If async saves are in flight, the alias is enqueued behind them on the
    writer thread so it can only ever point at a committed target."""
    _raise_failed_saves()
    path = os.path.abspath(os.path.join(directory, name))
    if jax.process_count() > 1 or not _PENDING:
        if _is_primary():
            _commit_alias(directory, path, target)
        _barrier(f"ckpt-alias:{name}")
    else:
        _PENDING.append(_writer().submit(_commit_alias, directory,
                                         path, target))
    return path


def _read_sidecar(resolved: str, path: str) -> Dict:
    """Sidecar for a resolved state dir: its own staged sidecar when
    present (`<resolved>.config.json`), else the canonical one (covers
    pre-staging checkpoints where `.saving` had no sidecar sibling)."""
    for cand in (resolved + ".config.json", path + ".config.json"):
        if os.path.exists(cand):
            with open(cand) as f:
                return json.load(f)
    return {}


def restore_checkpoint(directory: str, name: str,
                       target: Optional[Any] = None) -> Tuple[Any, Dict]:
    """-> (state, sidecar dict). Pass `target` (a matching abstract —
    jax.ShapeDtypeStruct — or concrete pytree) for safe typed restoration.
    Read-only: a stranded crash-window copy is read in place, never
    renamed (recovery happens on the next writer-side save).

    Collective under multi-process: Orbax `restore` syncs global processes
    internally (orbax checkpointer.py:310), so in a job with
    `jax.process_count() > 1` EVERY process must call this — which the
    trainers do; a lone polling reader must run as its own single-process
    job (e.g. eval/serving.py).

    Reader-vs-writer race (single-process pollers): a writer committing a
    new save swaps directories under the reader (`rename(path, old);
    rename(tmp, path); rmtree(old)`), so a restore spanning the swap can
    silently mix old and new array files, pair old params with the new
    sidecar, or crash on the vanishing `.replaced` copy. The resolved
    directory's inode is checked before and after the restore (the swap
    re-binds the path to a NEW inode); a mismatch or a mid-read
    disappearance retries against the freshly committed checkpoint.
    Multi-process jobs keep the single-attempt path — writers there gate
    saves with barriers, and a divergent per-process retry would desync
    the collective restore."""
    wait_for_saves()  # same-process read-after-async-write correctness
    path = os.path.abspath(os.path.join(directory, name))

    def attempt():
        resolved = _resolve_readable(path)
        if resolved is None:
            raise FileNotFoundError(f"no checkpoint at {path}")
        ino = os.stat(resolved).st_ino
        sidecar = _read_sidecar(resolved, path)
        state = (_checkpointer().restore(resolved, target)
                 if target is not None else _checkpointer().restore(resolved))
        if not os.path.isdir(resolved) or os.stat(resolved).st_ino != ino:
            raise _TornRead(f"checkpoint {resolved} replaced mid-restore")
        return state, sidecar

    if jax.process_count() > 1:
        return attempt()
    last_err: Optional[BaseException] = None
    for attempt_no in range(3):
        try:
            return attempt()
        except _TornRead as e:
            last_err = e
        except Exception as e:
            # A mid-swap mixed read can surface as ANY exception type, not
            # just FileNotFoundError/OSError: orbax raises ValueError/
            # KeyError when it pairs old and new array files, and a
            # vanishing sidecar can yield a JSONDecodeError. Retry them;
            # a genuinely absent checkpoint raises immediately, and an
            # error that REPEATS identically is deterministic (corrupt
            # checkpoint, mismatched `target` template), not a race — a
            # multi-GB restore must not run three full times for those.
            if _resolve_readable(path) is None:
                raise  # genuinely absent, not a swap window
            if (last_err is not None and type(e) is type(last_err)
                    and str(e) == str(last_err)):
                raise
            last_err = e
        if attempt_no < 2:
            time.sleep(0.25)  # let an in-flight swap commit
    raise last_err


def load_sidecar(directory: str, name: str) -> Dict:
    wait_for_saves()
    path = os.path.abspath(os.path.join(directory, name))
    resolved = _resolve_readable(path) or path
    sidecar = _read_sidecar(resolved, path)
    if not sidecar:
        raise FileNotFoundError(path + ".config.json")
    return sidecar


def load_config(directory: str, name: str) -> Dict:
    return load_sidecar(directory, name)["config"]


def checkpoint_exists(directory: str, name: str) -> bool:
    wait_for_saves()
    path = os.path.abspath(os.path.join(directory, name))
    return _resolve_readable(path) is not None
