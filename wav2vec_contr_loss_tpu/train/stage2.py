"""Stage-2: binary classifier over precomputed clip embeddings.

Equivalent of the reference's stage-2 trainer
(reference: train_stage2_classifier.py:17-62, stage2_utils.py:86-237):
linear or small-MLP head, BCE with pos_weight, per-epoch dev accuracy /
AUC / EER, early stopping on dev EER with patience (loss fallback when EER
is unavailable), best checkpoint embedding the config dict.

Embeddings are small ((N, 256) fp32), so whole epochs run as one jitted
`lax.scan` over pre-batched device arrays — no input pipeline needed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Stage2Config
from ..eval.metrics import binary_classification_metrics
from ..losses import bce_logits_loss, pos_weight_from_labels
from ..models.heads import build_head
from . import checkpoint as ckpt

__all__ = ["Stage2State", "train_stage2", "stage2_scores"]


@flax.struct.dataclass
class Stage2State:
    params: Any
    opt_state: Any
    rng: jax.Array


def _batchify(x: np.ndarray, y: np.ndarray, batch_size: int, rng=None):
    """-> (steps, B, ...) device-ready stacks, shuffled when `rng` is
    given (train) — the final partial batch is zero-padded + masked in
    BOTH paths, so no clip is ever dropped (the static-shape equivalent
    of the reference's DataLoader drop_last=False,
    train_stage2_classifier.py:46-50)."""
    n = x.shape[0]
    batch_size = min(batch_size, n)  # tiny datasets: shrink, don't starve
    if rng is not None:
        order = rng.permutation(n)
        x, y = x[order], y[order]
    steps = -(-n // batch_size)
    pad = steps * batch_size - n
    xp = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    yp = np.concatenate([y, np.zeros(pad, y.dtype)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return (
        xp.reshape(steps, batch_size, -1),
        yp.reshape(steps, batch_size),
        mask.reshape(steps, batch_size),
    )


def train_stage2(
    cfg: Stage2Config,
    train_embs: np.ndarray,
    train_labels: np.ndarray,
    dev_embs: np.ndarray,
    dev_labels: np.ndarray,
    save_dir: Optional[str] = None,
    log_fn=print,
    init_params: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """-> (best head params, history). Early stop on dev EER, patience
    cfg.patience (reference: stage2_utils.py:98-232).

    `init_params` warm-starts the head from an existing param tree
    (e.g. a restored checkpoint, or torch-converted weights — the
    trajectory-parity oracle uses this); default is a fresh seeded init.
    History carries per-epoch aggregates plus `step_losses` (one array
    of per-step train losses per epoch)."""
    head = build_head(cfg.head_type, cfg.hidden_dim, cfg.dropout)
    rng = jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(rng)
    if init_params is not None:
        params = init_params
    else:
        params = head.init(k_init, jnp.zeros((2, train_embs.shape[1])))["params"]

    pos_weight = pos_weight_from_labels(train_labels)
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    state = Stage2State(params=params, opt_state=tx.init(params), rng=k_run)

    @jax.jit
    def train_epoch_scan(state: Stage2State, xs, ys, ms):
        def step(st, xym):
            x, y, m = xym
            k, k_next = jax.random.split(st.rng)

            def loss_fn(p):
                logits = head.apply({"params": p}, x, deterministic=False,
                                    rngs={"dropout": k})
                # masked mean: a padded final batch trains on exactly its
                # real clips (reference: drop_last=False)
                return bce_logits_loss(logits, y, pos_weight, mask=m)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            st = st.replace(
                params=optax.apply_updates(st.params, updates),
                opt_state=opt_state, rng=k_next,
            )
            return st, (loss, jnp.sum(m))

        state, (losses, counts) = jax.lax.scan(step, state, (xs, ys, ms))
        # sample-weighted epoch mean — matches the reference's
        # total_loss += loss*batch_size; total/n accumulation
        # (stage2_utils.py:123-130)
        counts = counts.astype(jnp.float32)
        return state, jnp.sum(losses * counts) / jnp.sum(counts), losses

    @jax.jit
    def dev_logits_scan(params, xs):
        return jax.lax.scan(
            lambda _, x: (0, head.apply({"params": params}, x)), 0, xs
        )[1]

    np_rng = np.random.default_rng(cfg.seed)
    best_eer, best_dev_loss = float("inf"), float("inf")
    best_params = jax.device_get(state.params)
    epochs_no_improve = 0
    history = {"train_loss": [], "dev_loss": [], "dev_eer": [],
               "dev_acc": [], "step_losses": []}

    dev_x, dev_y, dev_mask = _batchify(dev_embs.astype(np.float32),
                                       dev_labels.astype(np.float32),
                                       cfg.batch_size)

    for epoch in range(1, cfg.epochs + 1):
        xs, ys, ms = _batchify(train_embs.astype(np.float32),
                               train_labels.astype(np.float32),
                               cfg.batch_size, np_rng)
        state, train_loss, step_losses = train_epoch_scan(
            state, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ms))
        train_loss = float(train_loss)
        history["step_losses"].append(np.asarray(step_losses))

        logits = np.asarray(dev_logits_scan(state.params, jnp.asarray(dev_x)))
        logits = logits.reshape(-1)[dev_mask.reshape(-1)]
        labels = dev_y.reshape(-1)[dev_mask.reshape(-1)]
        dev_loss = float(bce_logits_loss(logits, labels, pos_weight))
        probs = 1.0 / (1.0 + np.exp(-logits))
        dev_acc, dev_auc, dev_eer = binary_classification_metrics(labels, probs)

        history["train_loss"].append(train_loss)
        history["dev_loss"].append(dev_loss)
        history["dev_eer"].append(dev_eer)
        history["dev_acc"].append(dev_acc)
        msg = (f"[epoch {epoch:03d}] train_loss={train_loss:.4f} | "
               f"dev_loss={dev_loss:.4f} | dev_acc={dev_acc * 100:.2f}%")
        msg += f" | dev_auc={dev_auc:.4f}" if dev_auc is not None else " | dev_auc=N/A"
        msg += f" | dev_eer={dev_eer * 100:.2f}%" if dev_eer is not None else " | dev_eer=N/A"
        log_fn(msg)

        improved = (
            dev_eer < best_eer if dev_eer is not None
            else dev_loss < best_dev_loss
        )
        if improved:
            epochs_no_improve = 0
            if dev_eer is not None:
                best_eer = dev_eer
            best_dev_loss = min(best_dev_loss, dev_loss)
            best_params = jax.device_get(state.params)
            if save_dir is not None:
                ckpt.save_checkpoint(
                    save_dir, "stage2_binary_head_best", best_params,
                    cfg.ckpt_config(),
                    {"epoch": epoch, "dev_eer": dev_eer, "dev_acc": dev_acc,
                     "dev_auc": dev_auc, "dev_loss": dev_loss},
                )
        else:
            epochs_no_improve += 1
            if epochs_no_improve >= cfg.patience:
                log_fn(f"[EARLY STOP] patience {cfg.patience} reached "
                       f"(best EER={best_eer * 100:.2f}%)")
                break

    return best_params, history


def stage2_scores(cfg: Stage2Config, params: Dict, embs: np.ndarray,
                  batch_size: int = 4096) -> np.ndarray:
    """Raw logits for scoring (higher == more bonafide-like,
    reference: generate_eval_score_file.py:149-166)."""
    head = build_head(cfg.head_type, cfg.hidden_dim, cfg.dropout)
    apply = jax.jit(lambda p, x: head.apply({"params": p}, x))
    out = []
    for start in range(0, embs.shape[0], batch_size):
        out.append(np.asarray(
            apply(params, jnp.asarray(embs[start:start + batch_size],
                                      jnp.float32))
        ))
    return np.concatenate(out) if out else np.zeros(0, np.float32)
