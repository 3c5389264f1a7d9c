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
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "load_config",
           "load_sidecar", "checkpoint_exists", "alias_checkpoint"]


_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _host_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _remove(path: str) -> None:
    """Remove a checkpoint path whatever it is (dir, symlink, file)."""
    if os.path.islink(path) or os.path.isfile(path):
        os.remove(path)
    elif os.path.isdir(path):
        shutil.rmtree(path)


def _recover(path: str) -> None:
    """Close the rename window: a crash between `os.rename(path, old)` and
    `os.rename(tmp, path)` leaves no `path` but one or two complete copies
    under the sibling names. Orbax commits its own writes atomically (an
    interrupted save leaves a `*.orbax-checkpoint-tmp-*` dir, never the
    plain `.saving` name), so a directory at `.saving` is a complete NEW
    state — prefer it; `.replaced` is the complete previous state."""
    if os.path.exists(path):
        return
    tmp, old = path + ".saving", path + ".replaced"
    if os.path.isdir(tmp) and not os.path.islink(tmp):
        os.rename(tmp, path)
    elif os.path.isdir(old) and not os.path.islink(old):
        os.rename(old, path)


def save_checkpoint(directory: str, name: str, state: Any,
                    config: Optional[Dict] = None,
                    metrics: Optional[Dict] = None,
                    extra: Optional[Dict] = None) -> str:
    """Write <directory>/<name>, crash-safe: the new state is fully written
    to a temp sibling before the previous checkpoint is touched, so a crash
    mid-save never destroys the existing 'latest'/'best'.

    `config` is the reference-parity UPPERCASE dict; `extra` carries
    framework-side reload data (e.g. the encoder architecture dict)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, name))
    tmp = path + ".saving"
    old = path + ".replaced"
    _recover(path)  # adopt a complete copy stranded by a mid-swap crash
    for stale in (tmp, old):
        _remove(stale)
    c = _checkpointer()
    c.save(tmp, _host_tree(state))
    c.wait_until_finished()  # StandardCheckpointer saves asynchronously
    if os.path.islink(path):  # was an alias (dev-less run): drop the link
        os.remove(path)
    elif os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    sidecar = {"config": config or {}, "metrics": metrics or {},
               "extra": extra or {}}
    sidecar_tmp = path + ".config.json.tmp"
    with open(sidecar_tmp, "w") as f:
        json.dump(sidecar, f, indent=2, default=str)
    os.replace(sidecar_tmp, path + ".config.json")
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def alias_checkpoint(directory: str, name: str, target: str) -> str:
    """Make <directory>/<name> an alias (symlink) of <directory>/<target>.

    Used by dev-less training runs where no best-metric exists: 'best'
    tracks 'latest' without writing the state twice per epoch. Falls back
    to a real copy if the filesystem refuses symlinks."""
    path = os.path.abspath(os.path.join(directory, name))
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
    return path


def restore_checkpoint(directory: str, name: str,
                       target: Optional[Any] = None) -> Tuple[Any, Dict]:
    """-> (state, sidecar dict). Pass `target` (a matching abstract/conc
    pytree) for safe typed restoration."""
    path = os.path.abspath(os.path.join(directory, name))
    _recover(path)
    state = _checkpointer().restore(path, target) if target is not None else (
        _checkpointer().restore(path)
    )
    sidecar = {}
    if os.path.exists(path + ".config.json"):
        with open(path + ".config.json") as f:
            sidecar = json.load(f)
    return state, sidecar


def load_sidecar(directory: str, name: str) -> Dict:
    with open(os.path.join(directory, name + ".config.json")) as f:
        return json.load(f)


def load_config(directory: str, name: str) -> Dict:
    return load_sidecar(directory, name)["config"]


def checkpoint_exists(directory: str, name: str) -> bool:
    path = os.path.abspath(os.path.join(directory, name))
    _recover(path)
    return os.path.isdir(path)
