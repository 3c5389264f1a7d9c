"""Epoch-seeded balanced batch sampling, shardable across hosts/devices.

Semantics match the reference's BalancedBatchSampler
(reference: stage1_utils.py:21-50):
  * exactly batch_size/2 bonafide + batch_size/2 spoof indices per batch,
  * epoch count limited by the rarer class:
    num_batches = min(|real| // per_class, |fake| // per_class),
  * per-epoch reshuffle seeded by (seed + epoch), plus an in-batch shuffle,
  * deterministic given (seed, epoch) — a resumed run reproduces the
    exact same batch stream.

Sharding: the reference rank-strides whole batches for its (dead) DDP path
(stage1_utils.py:46-47). Under SPMD/pjit the natural unit is the *global*
batch: every host materializes the same global balanced batch order and
feeds its `jax.process_index()` slice of each batch; XLA sees one global
array. Both modes are provided (`stride` reproduces the reference).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np

__all__ = ["BalancedBatchSampler"]


class BalancedBatchSampler:
    def __init__(
        self,
        labels: Sequence[int],
        batch_size: int,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        mode: str = "global",  # 'global' (SPMD slice) | 'stride' (per-batch)
    ):
        if batch_size % 2 != 0:
            raise ValueError("batch_size must be even for balanced batches")
        if mode not in ("global", "stride"):
            raise ValueError(f"unknown sampler mode: {mode}")
        labels = np.asarray(labels).astype(np.int64)
        self.real = np.nonzero(labels == 1)[0]
        self.fake = np.nonzero(labels == 0)[0]
        self.batch_size = batch_size
        self.per_class = batch_size // 2
        self.num_batches = int(
            min(self.real.size // self.per_class, self.fake.size // self.per_class)
        )
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.mode = mode
        if mode == "global" and batch_size % (2 * world_size) != 0:
            raise ValueError(
                "global mode needs batch_size divisible by 2*world_size"
            )

    def __len__(self) -> int:
        if self.mode == "stride":
            # batches this rank yields under round-robin striding
            return (self.num_batches - self.rank + self.world_size - 1) // self.world_size
        return self.num_batches

    def epoch_batches(self, epoch: int) -> Iterator[np.ndarray]:
        """Yield index arrays for one epoch.

        'global': every rank yields the same full balanced batch; callers
        slice per-host shards from it (see pipeline.py).
        'stride': batch b goes to rank b % world_size only.
        """
        rng = np.random.default_rng(np.random.PCG64(self.seed + epoch))
        real = self.real[rng.permutation(self.real.size)]
        fake = self.fake[rng.permutation(self.fake.size)]
        pc = self.per_class
        for b in range(self.num_batches):
            idx = np.concatenate([real[b * pc:(b + 1) * pc], fake[b * pc:(b + 1) * pc]])
            idx = idx[rng.permutation(idx.size)]
            if self.mode == "stride":
                if b % self.world_size == self.rank:
                    yield idx
            else:
                yield idx

    def epoch_index_matrix(self, epoch: int) -> np.ndarray:
        """(num_batches, batch_size) int array of one epoch's batches —
        handy for prefetch pipelines that want the whole plan up front."""
        batches: List[np.ndarray] = list(self.epoch_batches(epoch))
        if not batches:
            return np.zeros((0, self.batch_size), np.int64)
        return np.stack(batches)
