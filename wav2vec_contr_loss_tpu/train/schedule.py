"""Hard-negative-mining alpha schedule.

alpha(epoch) = 0 during warmup, then a linear ramp to alpha_end over
alpha_ramp_epochs (reference: stage1_utils.py:84-88). The published sweeps
use warmup_epochs == epochs so alpha stays 0 (train_stage1.sbatch:79), but
the ramp is exercised by the precomputed-feature trainer
(train_stage1_from_emb.py:44) and tested here either way.
"""

from __future__ import annotations

__all__ = ["alpha_for_epoch"]


def alpha_for_epoch(epoch: int, warmup_epochs: int, alpha_ramp_epochs: int,
                    alpha_end: float) -> float:
    if epoch <= warmup_epochs:
        return 0.0
    t = min(1.0, (epoch - warmup_epochs) / max(1, alpha_ramp_epochs))
    return t * alpha_end
