"""Embedding / feature extraction to .npy (the filesystem contract between
pipeline stages, SURVEY.md §3.3).

  * extract_embeddings: stage-1 backbone -> (N, D) L2-normalized clip
    embeddings + (N,) labels, idempotent skip-if-exists
    (reference: extract_stage1_embeddings.py:168-360),
  * extract_encoder_features: raw layer-mean encoder features written
    incrementally to an (N, F, T=250) memmap with per-batch flush, optional
    RawBoost on the train split (reference: extract_encoder_embeddings.py:50-134).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..data.pipeline import BatchPipeline
from ..data.rawboost import RawBoostParams, apply_rawboost_batch

__all__ = ["extract_embeddings", "extract_encoder_features", "load_embeddings"]

FIXED_TIME_DIM = 250  # reference: extract_encoder_embeddings.py:33


def _paths(out_dir: str, split_name: str) -> Tuple[str, str]:
    return (
        os.path.join(out_dir, f"{split_name}_embeddings.npy"),
        os.path.join(out_dir, f"{split_name}_labels.npy"),
    )


def extract_embeddings(
    embed_fn,
    pipe: BatchPipeline,
    out_dir: str,
    split_name: str,
    overwrite: bool = False,
    log_fn=print,
) -> Tuple[str, str]:
    """embed_fn: (B, T) waveforms -> (B, D) embeddings (jitted backbone).
    Writes <split>_embeddings.npy / <split>_labels.npy; skips when both
    already exist (reference: extract_stage1_embeddings.py:183-187)."""
    os.makedirs(out_dir, exist_ok=True)
    emb_path, lab_path = _paths(out_dir, split_name)
    if not overwrite and os.path.exists(emb_path) and os.path.exists(lab_path):
        log_fn(f"[SKIP] existing {split_name} embeddings: {emb_path}")
        return emb_path, lab_path

    import jax

    from ..data.pipeline import stream_through_device

    zs, ys, ms = [], [], []
    # overlapped H2D / compute / D2H (VERDICT r2 weak #5)
    for z, batch in stream_through_device(
        pipe.sequential(), lambda b: jax.device_put(b.waveforms), embed_fn
    ):
        zs.append(z[batch.valid])
        ys.append(batch.labels[batch.valid])
        ms.append(batch.multi_labels[batch.valid])
    embs = np.concatenate(zs).astype(np.float32)
    labels = np.concatenate(ys).astype(np.int64)
    np.save(emb_path, embs)
    np.save(lab_path, labels)
    # attack-id classes enable per-attack UMAP coloring
    # (reference: plot_stage1_umap_asv.py) plus the attack-name map
    np.save(os.path.join(out_dir, f"{split_name}_multi_labels.npy"),
            np.concatenate(ms).astype(np.int64))
    import json

    with open(os.path.join(out_dir, f"{split_name}_attack_map.json"), "w") as f:
        json.dump(pipe.dataset.attack_to_idx, f)
    log_fn(f"[OK] {split_name}: {embs.shape} -> {emb_path}")
    return emb_path, lab_path


def extract_encoder_features(
    layer_mean_fn,
    pipe: BatchPipeline,
    out_dir: str,
    split_name: str,
    rawboost: Optional[RawBoostParams] = None,
    rawboost_prob: float = 0.9,
    seed: int = 1337,
    overwrite: bool = False,
    log_fn=print,
) -> Tuple[str, str]:
    """layer_mean_fn: (B, T_samples) -> (B, T_frames, F) K-averaged encoder
    features. Streams (N, F, 250) straight to a disk memmap, flushing per
    batch so partial runs leave valid data
    (reference: extract_encoder_embeddings.py:61-97)."""
    os.makedirs(out_dir, exist_ok=True)
    emb_path = os.path.join(out_dir, f"{split_name}_features.npy")
    lab_path = os.path.join(out_dir, f"{split_name}_feature_labels.npy")
    if not overwrite and os.path.exists(emb_path) and os.path.exists(lab_path):
        log_fn(f"[SKIP] existing {split_name} features: {emb_path}")
        return emb_path, lab_path

    import jax

    from ..data.pipeline import stream_through_device

    n = len(pipe.dataset)
    feat_dim = None
    out = None
    labels = np.zeros(n, np.int64)
    rng = np.random.default_rng(seed)
    row = 0

    def put(batch):
        # host DSP + H2D both happen in the prefetch thread; the single
        # producer keeps the rng draw order deterministic
        waves = batch.waveforms
        if rawboost is not None:
            waves = apply_rawboost_batch(waves, rng, rawboost,
                                         prob=rawboost_prob)
        return jax.device_put(waves)

    for feats, batch in stream_through_device(
        pipe.sequential(), put, layer_mean_fn
    ):
        feats = feats.transpose(0, 2, 1)                   # (B,T',F)->(B,F,T')
        t = feats.shape[2]
        if t >= FIXED_TIME_DIM:
            feats = feats[:, :, :FIXED_TIME_DIM]
        else:
            feats = np.pad(feats, ((0, 0), (0, 0), (0, FIXED_TIME_DIM - t)))
        if out is None:
            feat_dim = feats.shape[1]
            out = np.lib.format.open_memmap(
                emb_path, mode="w+", dtype=np.float32,
                shape=(n, feat_dim, FIXED_TIME_DIM),
            )
        k = int(batch.valid.sum())
        out[row:row + k] = feats[batch.valid]
        labels[row:row + k] = batch.labels[batch.valid]
        row += k
        out.flush()
    np.save(lab_path, labels[:row])
    log_fn(f"[OK] {split_name}: ({row}, {feat_dim}, {FIXED_TIME_DIM}) -> {emb_path}")
    return emb_path, lab_path


def load_embeddings(out_dir: str, split_name: str, mmap: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Memmap loading mirrors NumpyMemmapDataset
    (reference: train_stage1_from_emb.py:55-72)."""
    emb_path, lab_path = _paths(out_dir, split_name)
    embs = np.load(emb_path, mmap_mode="r" if mmap else None)
    labels = np.load(lab_path)
    return embs, labels
