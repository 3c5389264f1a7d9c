"""Binary cross-entropy with logits, with optional positive-class weighting.

TPU-native equivalent of the reference's BCE baseline loss
(reference: loss.py:213-258): numerically stable softplus form, fp32 math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bce_logits_loss", "pos_weight_from_labels"]


def bce_logits_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    pos_weight: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """mean_i [ w_p * y_i * softplus(-x_i) + (1 - y_i) * softplus(x_i) ]

    Identical to torch.nn.BCEWithLogitsLoss(pos_weight=w_p) with mean
    reduction. `pos_weight` is a static float (neg/pos class ratio).
    `mask` (optional, same leading shape as labels) restricts the mean to
    the valid elements — a zero-padded partial batch then yields exactly
    the mean over its real elements (the static-shape equivalent of
    torch's drop_last=False final batch)."""
    x = logits.astype(jnp.float32).reshape(-1)
    y = labels.astype(jnp.float32).reshape(-1)
    w_p = 1.0 if pos_weight is None else float(pos_weight)
    per_example = w_p * y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
    if mask is None:
        return jnp.mean(per_example)
    m = mask.astype(jnp.float32).reshape(-1)
    return jnp.sum(per_example * m) / jnp.maximum(jnp.sum(m), 1.0)


def pos_weight_from_labels(labels01) -> float:
    """neg/pos class ratio for imbalance correction; 1.0 if a class is empty
    (reference: loss.py:242-258, stage2_utils.py:53-58)."""
    labels01 = np.asarray(labels01).astype(np.int64).ravel()
    pos = int((labels01 == 1).sum())
    neg = int((labels01 == 0).sum())
    if pos == 0 or neg == 0:
        return 1.0
    return float(neg) / float(pos)
