"""Visualization: 2-D projection + plot file outputs.

The PCA-fallback tests always run; the true-UMAP and plotly-HTML branch
tests skip when umap-learn/plotly are absent (they are not in this image —
install via the `viz` extra in pyproject.toml to exercise them)."""

import os

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.viz import plot_embeddings_2d, project_2d


def test_project_2d_shapes_and_determinism(rng):
    x = rng.normal(size=(50, 16)).astype(np.float32)
    p1 = project_2d(x, seed=1)
    p2 = project_2d(x, seed=1)
    assert p1.shape == (50, 2)
    np.testing.assert_array_equal(p1, p2)
    # PCA fallback: projections carry the top variance directions
    assert p1.std(axis=0).min() > 0


def test_project_2d_true_umap_branch(rng):
    """The real umap-learn path (viz/umap_plots.py:33-40): reference
    projection parameters (n_neighbors=15, min_dist=0.1, seeded) applied by
    an actual UMAP reducer — shape, determinism under random_state, and
    neighborhood preservation on a two-cluster input."""
    pytest.importorskip("umap")
    a = rng.normal(size=(40, 16)).astype(np.float32)
    b = rng.normal(size=(40, 16)).astype(np.float32) + 8.0
    x = np.concatenate([a, b])
    p1 = project_2d(x, seed=7)
    p2 = project_2d(x, seed=7)
    assert p1.shape == (80, 2)
    np.testing.assert_allclose(p1, p2)  # random_state pins the embedding
    # the two well-separated clusters stay separated in 2-D
    ca, cb = p1[:40].mean(axis=0), p1[40:].mean(axis=0)
    spread = max(p1[:40].std(), p1[40:].std())
    assert np.linalg.norm(ca - cb) > 2 * spread


def test_plot_embeddings_2d_writes_plotly_html(tmp_path, rng):
    """The plotly branch (viz/umap_plots.py:84-94): out_html must produce a
    real interactive HTML file when plotly is importable (reference writes
    one alongside the PNG, plot_stage1_umap_asv.py)."""
    pytest.importorskip("plotly")
    embs = rng.normal(size=(30, 8))
    labels = np.array([1, 0] * 15)
    html = tmp_path / "plots" / "umap.html"
    plot_embeddings_2d(
        embs, labels, str(tmp_path / "plots" / "umap.png"),
        label_names={1: "Real", 0: "Spoof"}, out_html=str(html),
    )
    assert html.exists() and html.stat().st_size > 1000
    assert b"plotly" in html.read_bytes().lower()


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
