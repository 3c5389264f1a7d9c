"""Decode-once waveform cache.

Training decodes every clip from FLAC/WAV once per epoch (the reference
re-decodes with librosa every epoch for 100 epochs,
base_audio.py:21-34). Decode is pure host CPU — on a few-vCPU TPU host
it is the input pipeline's dominant cost and can starve the device. The
cache decodes the corpus ONCE through the dataset's own AudioLoader
(keeping the zero-fallback corruption contract) into a fixed-shape
memmap; every later epoch reads rows instead of decoding.

Storage is int16 by default: source audio is 16-bit PCM, so for
unresampled input the round trip is EXACT, and otherwise re-quantizes at
most 1 LSB (~-90 dB) with the `wave != 0` zero-set preserved — the same
fidelity contract as the int16 wire format (ops/wire.py), and half the
disk/page-cache of float32 (a 153k-clip 5 s corpus is ~24.5 GB vs 49).
`dtype='float32'` stores the decoder output bit-exactly.

The cache is validated against a fingerprint of the utterance path list
+ audio config; any mismatch rebuilds. Writes are crash-safe: data is
written to a temp sibling and the manifest (whose presence marks
validity) is renamed into place last.
"""
from __future__ import annotations

import hashlib
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import numpy as np
from numpy.lib.format import open_memmap

from ..ops.wire import WIRE_SCALE, quantize_wire

__all__ = ["attach_cache", "build_cache", "CachedLoader"]

_MANIFEST = "cache_manifest.json"
_DATA = "waveforms.npy"


def _fingerprint(dataset, dtype: str) -> Dict:
    paths = "\n".join(str(u.path) for u in dataset.utterances)
    cfg = dataset.audio_config
    return {
        "version": 1,
        "n": len(dataset.utterances),
        "num_samples": int(cfg.num_samples),
        "sample_rate": int(cfg.target_sample_rate),
        "dtype": dtype,
        "paths_sha256": hashlib.sha256(paths.encode()).hexdigest(),
    }


class CachedLoader:
    """Duck-types AudioLoader.load(path): memmap row reads instead of
    decode. Unknown paths (e.g. a probe outside the cached corpus) fall
    back to the real loader."""

    def __init__(self, memmap: np.ndarray, path_to_row: Dict[str, int],
                 fallback):
        self._mm = memmap
        self._rows = path_to_row
        self._fallback = fallback
        self.config = fallback.config

    def load(self, path) -> np.ndarray:
        from .audio import AudioLoader

        i = self._rows.get(str(path))
        if i is None:
            return self._fallback.load(path)
        # keep the loaded/failed accounting contract (print_summary,
        # cli.serve's final line): a cache-row read is a successful load
        # — corrupted files were counted failed once at build time
        with AudioLoader._count_lock:
            AudioLoader.loaded_count += 1
        row = self._mm[i]
        if row.dtype == np.int16:
            return row.astype(np.float32) * np.float32(1.0 / WIRE_SCALE)
        return np.array(row, dtype=np.float32)  # copy: rows are reused


def build_cache(dataset, cache_dir: str, dtype: str = "int16",
                num_workers: int = 8, log=print) -> str:
    """Decode the whole dataset once into <cache_dir>/waveforms.npy.
    Returns the data path. Corrupted files keep the zero-fallback
    contract (they decode to zero rows via the dataset's own loader)."""
    if dtype not in ("int16", "float32"):
        raise ValueError(f"cache dtype must be int16|float32, got {dtype}")
    if dataset.audio_config.max_duration_seconds is None:
        raise ValueError("waveform cache needs fixed-length clips "
                         "(audio_config.max_duration_seconds is None)")
    os.makedirs(cache_dir, exist_ok=True)
    n = len(dataset.utterances)
    t = dataset.audio_config.num_samples
    data_path = os.path.join(cache_dir, _DATA)
    tmp = data_path + ".building"
    mm = open_memmap(tmp, mode="w+", dtype=np.dtype(dtype), shape=(n, t))
    log(f"[CACHE] decoding {n} clips -> {data_path} ({dtype}, "
        f"{mm.nbytes / 1e9:.2f} GB)")

    def decode_row(i: int) -> None:
        w = dataset.loader.load(dataset.utterances[i].path)
        mm[i] = quantize_wire(w) if dtype == "int16" else w

    with ThreadPoolExecutor(max(1, num_workers)) as pool:
        list(pool.map(decode_row, range(n)))
    mm.flush()
    del mm
    # Invalidate BEFORE swapping the data file: a crash between the two
    # replaces must leave NO manifest, never an old still-valid manifest
    # paired with the new rows (a later run with the old corpus would
    # silently read the wrong audio for every clip).
    manifest_path = os.path.join(cache_dir, _MANIFEST)
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    os.replace(tmp, data_path)
    manifest_tmp = os.path.join(cache_dir, _MANIFEST + ".building")
    with open(manifest_tmp, "w") as f:
        json.dump(_fingerprint(dataset, dtype), f)
    os.replace(manifest_tmp, manifest_path)
    log(f"[CACHE] built ({n} rows)")
    return data_path


def _valid(dataset, cache_dir: str, dtype: str) -> bool:
    try:
        with open(os.path.join(cache_dir, _MANIFEST)) as f:
            return json.load(f) == _fingerprint(dataset, dtype)
    except (OSError, json.JSONDecodeError):
        return False


def attach_cache(dataset, cache_dir: str, dtype: str = "int16",
                 num_workers: int = 8, log=print) -> bool:
    """Point `dataset.loader` at the cache, building it first if absent
    or stale (corpus/config fingerprint mismatch). Returns True if a
    build ran (on this process).

    Multi-process safe on a shared directory: only process 0 builds
    (concurrent builders would truncate each other's memmap and race the
    final renames), and every process barriers before opening, so
    non-primaries never observe a half-built cache. Must therefore be
    called by ALL processes (which the train CLIs do)."""
    import jax

    built = False
    if not _valid(dataset, cache_dir, dtype):
        if jax.process_index() == 0:
            build_cache(dataset, cache_dir, dtype=dtype,
                        num_workers=num_workers, log=log)
            built = True
        else:
            log(f"[CACHE] waiting for primary build of {cache_dir}")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(
            f"wavecache:{os.path.basename(cache_dir)}")
    mm = np.load(os.path.join(cache_dir, _DATA), mmap_mode="r")
    rows = {str(u.path): i for i, u in enumerate(dataset.utterances)}
    dataset.loader = CachedLoader(mm, rows, dataset.loader)
    if not built:
        log(f"[CACHE] reusing {cache_dir} ({len(rows)} rows)")
    return built
