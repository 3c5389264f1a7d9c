"""Supervised-contrastive losses, fused for TPU.

The reference computes SupCon with a serial per-anchor Python loop over the
batch (reference: loss.py:110-153) — the #1 fusion target flagged in
SURVEY.md §2.3. Here the whole loss is one batched computation: a (B, B)
similarity matrix, masked log-sum-exp, and a `lax.top_k` mined denominator,
all inside jit. Everything runs in fp32 regardless of the embedding compute
dtype (bf16 matmuls upstream, fp32 loss math).

Semantics match the reference exactly, including the edge rules:
  * anchors with no positives contribute nothing (loss.py:45-46),
  * mined terms need >=1 positive and >=1 negative (loss.py:58-59),
  * if no anchor has a mined term, the mined loss falls back to the full
    loss (loss.py:142-145),
  * a batch where no anchor has positives yields 0 (loss.py:138-139),
  * geodesic similarity = 2*(1 - arccos(clamp(dot))/pi) - 1 (loss.py:96-107),
  * uniformity = log(mean_{i<j} exp(-t*||zi-zj||^2) + 1e-8) (loss.py:77-93).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
import jax
import jax.numpy as jnp

__all__ = [
    "SupConConfig",
    "pairwise_similarity",
    "supcon_binary_loss",
    "supcon_multiclass_loss",
    "uniformity_loss",
]

# Large-negative stand-in for -inf: keeps every logsumexp/exp finite so no
# NaNs can leak through `where` gradients.
_NEG = -1e30


@dataclass(frozen=True)
class SupConConfig:
    """Static (compile-time) SupCon hyperparameters.

    `alpha` is deliberately NOT here: it ramps per epoch
    (reference: stage1_utils.py:84-88) and is passed as a traced scalar so
    the train step never recompiles.
    """

    temperature: float = 0.2
    similarity: str = "cosine"  # 'cosine' | 'geodesic'
    topk_neg: int = 15
    uniformity_weight: float = 0.0
    uniformity_t: float = 2.0

    def __post_init__(self):
        if self.similarity not in ("cosine", "geodesic"):
            raise ValueError(f"Unknown similarity: {self.similarity}")


def pairwise_similarity(z: jnp.ndarray, similarity: str = "cosine") -> jnp.ndarray:
    """(B, D) L2-normalized embeddings -> (B, B) similarity in [-1, 1].

    cosine: plain Gram matrix. geodesic: the angle arccos(dot) remapped
    linearly onto [-1, 1] so both similarities share the cosine range
    (reference: loss.py:96-107).
    """
    z = z.astype(jnp.float32)
    # Full fp32 on the MXU: the (B,B) Gram matrix is tiny and the loss is
    # fp32 territory — don't let the TPU default to bf16 passes here.
    dot = jnp.dot(z, z.T, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    if similarity == "cosine":
        return dot
    eps = 1e-7
    theta = jnp.arccos(jnp.clip(dot, -1.0 + eps, 1.0 - eps))
    return 2.0 * (1.0 - theta / math.pi) - 1.0


def _masked_logsumexp(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Row-wise logsumexp over masked entries; rows with nothing selected
    return _NEG-ish values (never NaN, gradients stay finite)."""
    masked = jnp.where(mask, logits, _NEG)
    row_max = jax.lax.stop_gradient(jnp.max(masked, axis=-1, keepdims=True))
    row_max = jnp.maximum(row_max, -1e30)
    sums = jnp.sum(jnp.where(mask, jnp.exp(logits - row_max), 0.0), axis=-1)
    return jnp.squeeze(row_max, -1) + jnp.log(jnp.maximum(sums, 1e-38))


def uniformity_loss(z: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """Wang & Isola uniformity on the hypersphere:
    log( mean_{i<j} exp(-t * ||z_i - z_j||^2) + 1e-8 ).

    Computed from the Gram matrix instead of an explicit pdist vector
    (reference: loss.py:77-93); B is static so the i<j pair count is too.
    """
    z = z.astype(jnp.float32)
    b = z.shape[0]
    if b < 2:
        return jnp.zeros((), jnp.float32)
    sq_norms = jnp.sum(z * z, axis=-1)
    dot = jnp.dot(z, z.T, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    sqd = jnp.maximum(sq_norms[:, None] + sq_norms[None, :] - 2.0 * dot, 0.0)
    upper = jnp.triu(jnp.ones((b, b), dtype=bool), k=1)
    n_pairs = b * (b - 1) // 2
    mean_exp = jnp.sum(jnp.where(upper, jnp.exp(-t * sqd), 0.0)) / n_pairs
    return jnp.log(mean_exp + 1e-8)


@partial(jax.jit, static_argnames=("config",))
def supcon_binary_loss(
    z: jnp.ndarray,          # (B, D) L2-normalized embeddings
    labels: jnp.ndarray,     # (B,) int in {0, 1}
    alpha: jnp.ndarray,      # traced scalar in [0, 1]: weight on mined loss
    config: SupConConfig = SupConConfig(),
) -> jnp.ndarray:
    """Binary SupCon with alpha-blended top-K hard-negative mining and an
    optional uniformity regularizer (reference: loss.py:6-153), as a single
    fused batched computation.

      main = (1 - alpha) * SupCon_full + alpha * SupCon_minedTopK
      total = main + lambda_uni * L_uni(z)
    """
    z = z.astype(jnp.float32)
    b = z.shape[0]
    labels = labels.reshape(-1)

    sim = pairwise_similarity(z, config.similarity)
    eye = jnp.eye(b, dtype=bool)
    logits = jnp.where(eye, _NEG, sim / config.temperature)

    same = labels[:, None] == labels[None, :]
    pos_mask = same & ~eye
    neg_mask = ~same & ~eye

    n_pos = jnp.sum(pos_mask, axis=-1)
    n_neg = jnp.sum(neg_mask, axis=-1)
    has_pos = n_pos > 0
    has_neg = n_neg > 0

    # mean positive logit per anchor (the shared numerator of both terms)
    sum_pos = jnp.sum(jnp.where(pos_mask, logits, 0.0), axis=-1)
    mean_pos = sum_pos / jnp.maximum(n_pos, 1)

    # ---- full SupCon: denominator = all non-self samples ----
    lse_all = _masked_logsumexp(logits, ~eye)
    loss_full_i = lse_all - mean_pos
    num_full = jnp.sum(has_pos)
    loss_full = jnp.sum(jnp.where(has_pos, loss_full_i, 0.0)) / jnp.maximum(
        num_full, 1
    )

    # ---- mined SupCon: denominator = positives + top-K hardest negatives ----
    if b >= 2:
        k = min(config.topk_neg, b - 1)
        neg_logits = jnp.where(neg_mask, logits, _NEG)
        topk_vals = jax.lax.top_k(neg_logits, k)[0]          # (B, k), pads = _NEG
        # logsumexp over [positives ∪ top-k negatives]; the _NEG pads (slots
        # beyond each anchor's true negative count) contribute exp(..)=0.
        combined = jnp.concatenate(
            [jnp.where(pos_mask, logits, _NEG), topk_vals], axis=-1
        )
        lse_mined = _masked_logsumexp(combined, combined > _NEG / 2)
        valid_mined = has_pos & has_neg
        loss_mined_i = lse_mined - mean_pos
        num_mined = jnp.sum(valid_mined)
        loss_mined_avg = jnp.sum(
            jnp.where(valid_mined, loss_mined_i, 0.0)
        ) / jnp.maximum(num_mined, 1)
        # fall back to the full loss when no anchor had a mined term
        loss_mined = jnp.where(num_mined > 0, loss_mined_avg, loss_full)
    else:
        loss_mined = loss_full

    alpha = jnp.asarray(alpha, jnp.float32)
    main = (1.0 - alpha) * loss_full + alpha * loss_mined
    # degenerate batch (no anchor has a positive) -> 0
    main = jnp.where(num_full > 0, main, 0.0)

    if config.uniformity_weight > 0.0 and b > 1:
        main = main + config.uniformity_weight * uniformity_loss(
            z, config.uniformity_t
        )
    return main


@partial(jax.jit, static_argnames=("temperature",))
def supcon_multiclass_loss(
    z: jnp.ndarray,        # (B, D) L2-normalized embeddings
    labels: jnp.ndarray,   # (B,) int class ids (attack ids; bonafide = 0)
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Khosla-style multi-class SupCon over attack-id classes, cosine only
    (reference: loss.py:156-210), vectorized over anchors."""
    z = z.astype(jnp.float32)
    b = z.shape[0]
    labels = labels.reshape(-1)

    logits = jnp.dot(z, z.T, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32) / temperature
    eye = jnp.eye(b, dtype=bool)
    logits = jnp.where(eye, _NEG, logits)

    pos_mask = (labels[:, None] == labels[None, :]) & ~eye
    n_pos = jnp.sum(pos_mask, axis=-1)
    has_pos = n_pos > 0

    mean_pos = jnp.sum(jnp.where(pos_mask, logits, 0.0), axis=-1) / jnp.maximum(
        n_pos, 1
    )
    lse_all = _masked_logsumexp(logits, ~eye)
    loss_i = lse_all - mean_pos
    num = jnp.sum(has_pos)
    return jnp.where(
        num > 0, jnp.sum(jnp.where(has_pos, loss_i, 0.0)) / jnp.maximum(num, 1), 0.0
    )
