"""Visualization: 2-D projection + plot file outputs (PCA fallback path,
since umap-learn is absent in this image)."""

import os

import numpy as np

from wav2vec_contr_loss_tpu.viz import plot_embeddings_2d, project_2d


def test_project_2d_shapes_and_determinism(rng):
    x = rng.normal(size=(50, 16)).astype(np.float32)
    p1 = project_2d(x, seed=1)
    p2 = project_2d(x, seed=1)
    assert p1.shape == (50, 2)
    np.testing.assert_array_equal(p1, p2)
    # PCA fallback: projections carry the top variance directions
    assert p1.std(axis=0).min() > 0


def test_plot_embeddings_2d(tmp_path, rng):
    embs = rng.normal(size=(40, 8))
    labels = np.array([1, 0] * 20)
    out = plot_embeddings_2d(
        embs, labels, str(tmp_path / "plots" / "umap.png"),
        label_names={1: "Real", 0: "Spoof"},
        out_html=str(tmp_path / "plots" / "umap.html"),
    )
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000  # an actual rendered PNG
