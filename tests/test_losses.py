"""Loss parity tests.

Two oracles:
  1. a per-anchor numpy transcription of the SupCon math (written from the
     formulas, mirroring the reference's serial loop semantics),
  2. when the reference repo is mounted, the reference torch implementation
     itself (loaded via importlib, never copied).
Our fused JAX losses must match both to fp32 precision, including edge cases
(no positives, B<2, k > |negatives|, alpha in {0, mid, 1}).
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.losses import (
    SupConConfig,
    bce_logits_loss,
    pos_weight_from_labels,
    supcon_binary_loss,
    supcon_multiclass_loss,
    uniformity_loss,
)


# ---------------------------------------------------------------- oracles
def np_similarity(z, kind):
    dot = z @ z.T
    if kind == "cosine":
        return dot
    eps = 1e-7
    theta = np.arccos(np.clip(dot, -1 + eps, 1 - eps))
    return 2.0 * (1.0 - theta / math.pi) - 1.0


def np_supcon_binary(z, labels, tau, kind, topk, alpha, lam, uni_t):
    """Serial per-anchor oracle with the reference's exact edge rules."""
    b = z.shape[0]
    sim = np_similarity(z, kind)
    np.fill_diagonal(sim, -np.inf)
    full_terms, mined_terms = [], []
    for i in range(b):
        pos = [j for j in range(b) if j != i and labels[j] == labels[i]]
        neg = [j for j in range(b) if j != i and labels[j] != labels[i]]
        logits = sim[i] / tau
        if pos:
            finite = np.array([logits[j] for j in range(b) if j != i])
            lse = np.logaddexp.reduce(finite)
            full_terms.append(lse - np.mean([logits[j] for j in pos]))
            if neg:
                k = min(topk, len(neg))
                neg_sorted = np.sort([logits[j] for j in neg])[::-1][:k]
                denom = np.concatenate([[logits[j] for j in pos], neg_sorted])
                lse_m = np.logaddexp.reduce(denom)
                mined_terms.append(lse_m - np.mean([logits[j] for j in pos]))
    if not full_terms:
        main = 0.0
    else:
        lf = float(np.mean(full_terms))
        lm = float(np.mean(mined_terms)) if mined_terms else lf
        main = (1 - alpha) * lf + alpha * lm
    if lam > 0 and b > 1:
        sqd = []
        for i in range(b):
            for j in range(i + 1, b):
                sqd.append(np.sum((z[i] - z[j]) ** 2))
        main += lam * np.log(np.mean(np.exp(-uni_t * np.array(sqd))) + 1e-8)
    return main


def np_supcon_multiclass(z, labels, tau):
    b = z.shape[0]
    sim = z @ z.T / tau
    np.fill_diagonal(sim, -np.inf)
    terms = []
    for i in range(b):
        pos = [j for j in range(b) if j != i and labels[j] == labels[i]]
        if not pos:
            continue
        finite = np.array([sim[i, j] for j in range(b) if j != i])
        lse = np.logaddexp.reduce(finite)
        terms.append(lse - np.mean([sim[i, j] for j in pos]))
    return float(np.mean(terms)) if terms else 0.0


def normed(rng, b, d):
    z = rng.normal(size=(b, d)).astype(np.float32)
    return z / np.linalg.norm(z, axis=1, keepdims=True)


# ------------------------------------------------------------ numpy parity
CASES = [
    # (B, D, labels_kind, tau, sim, topk, alpha, lam)
    (16, 8, "balanced", 0.2, "cosine", 15, 0.0, 0.0),
    (16, 8, "balanced", 0.07, "geodesic", 15, 0.0, 0.0),
    (16, 8, "balanced", 0.2, "cosine", 4, 0.5, 0.0),
    (16, 8, "balanced", 0.6, "geodesic", 100, 1.0, 0.0),  # k > |neg|
    (16, 8, "balanced", 0.2, "cosine", 15, 0.3, 0.2),     # + uniformity
    (12, 6, "one_odd", 0.2, "cosine", 15, 0.7, 0.0),      # 1 spoof only
    (10, 6, "all_same", 0.2, "cosine", 15, 0.5, 0.05),    # no negatives
    (2, 4, "balanced", 0.2, "geodesic", 15, 0.5, 0.1),    # tiny batch
    (3, 4, "distinct", 0.2, "cosine", 15, 0.5, 0.0),      # no positives
]


def make_labels(kind, b, rng):
    if kind == "balanced":
        lab = np.array([1] * (b // 2) + [0] * (b - b // 2))
        rng.shuffle(lab)
        return lab
    if kind == "one_odd":
        lab = np.ones(b, dtype=int)
        lab[0] = 0
        return lab
    if kind == "all_same":
        return np.ones(b, dtype=int)
    if kind == "distinct":
        return np.arange(b)
    raise ValueError(kind)


@pytest.mark.parametrize("b,d,lk,tau,sim,topk,alpha,lam", CASES)
def test_supcon_binary_matches_numpy_oracle(rng, b, d, lk, tau, sim, topk, alpha, lam):
    z = normed(rng, b, d)
    labels = make_labels(lk, b, rng)
    cfg = SupConConfig(
        temperature=tau, similarity=sim, topk_neg=topk,
        uniformity_weight=lam, uniformity_t=2.0,
    )
    got = float(supcon_binary_loss(z, labels, alpha, cfg))
    want = np_supcon_binary(z.astype(np.float64), labels, tau, sim, topk, alpha, lam, 2.0)
    assert got == pytest.approx(want, rel=2e-5, abs=2e-5)


def test_supcon_multiclass_matches_numpy_oracle(rng):
    for labels in [np.array([0, 0, 1, 1, 2, 2, 3, 3]), np.arange(8), np.zeros(8, int)]:
        z = normed(rng, 8, 16)
        got = float(supcon_multiclass_loss(z, labels, temperature=0.1))
        want = np_supcon_multiclass(z.astype(np.float64), labels, 0.1)
        assert got == pytest.approx(want, rel=2e-5, abs=2e-5)


def test_gradients_finite(rng):
    import jax

    z = normed(rng, 16, 8)
    labels = make_labels("balanced", 16, rng)
    cfg = SupConConfig(temperature=0.07, similarity="geodesic", topk_neg=5,
                       uniformity_weight=0.1)

    def f(zz):
        return supcon_binary_loss(zz, labels, 0.5, cfg)

    g = jax.grad(f)(z)
    assert np.all(np.isfinite(np.asarray(g)))

    # degenerate batches must also have finite (zero-ish) grads
    g2 = jax.grad(lambda zz: supcon_binary_loss(zz, np.arange(4), 0.5,
                                                SupConConfig()))(normed(rng, 4, 8))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_uniformity_degenerate():
    assert float(uniformity_loss(np.ones((1, 4), np.float32))) == 0.0


# ------------------------------------------------- reference torch parity
@pytest.fixture(scope="module")
def reference_loss_module():
    path = "/root/reference/loss.py"
    if not os.path.exists(path):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location("ref_loss", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_loss"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("b,d,lk,tau,sim,topk,alpha,lam", CASES)
def test_supcon_binary_matches_reference_torch(
    reference_loss_module, rng, b, d, lk, tau, sim, topk, alpha, lam
):
    import torch

    z = normed(rng, b, d)
    labels = make_labels(lk, b, rng)
    ref = reference_loss_module.SupConBinaryLoss(
        temperature=tau, similarity=sim, uniformity_weight=lam, uniformity_t=2.0
    )
    want = float(
        ref(torch.from_numpy(z), torch.from_numpy(labels), topk_neg=topk, alpha=alpha)
    )
    cfg = SupConConfig(temperature=tau, similarity=sim, topk_neg=topk,
                       uniformity_weight=lam, uniformity_t=2.0)
    got = float(supcon_binary_loss(z, labels, alpha, cfg))
    assert got == pytest.approx(want, rel=3e-4, abs=3e-5)


def test_multiclass_matches_reference_torch(reference_loss_module, rng):
    import torch

    z = normed(rng, 12, 8)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 6])
    ref = reference_loss_module.SupConMultiClassLoss(temperature=0.1)
    want = float(ref(torch.from_numpy(z), torch.from_numpy(labels)))
    got = float(supcon_multiclass_loss(z, labels, temperature=0.1))
    assert got == pytest.approx(want, rel=3e-4, abs=3e-5)


def test_bce_matches_reference_torch(reference_loss_module, rng):
    import torch

    logits = rng.normal(size=32).astype(np.float32)
    labels = (rng.random(32) < 0.3).astype(np.float32)
    for pw in [None, 8.8372]:
        ref = reference_loss_module.BCEBinaryLoss(pos_weight=pw)
        want = float(ref(torch.from_numpy(logits), torch.from_numpy(labels)))
        got = float(bce_logits_loss(logits, labels, pos_weight=pw))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_pos_weight_from_labels():
    assert pos_weight_from_labels([1, 0, 0, 0]) == 3.0
    assert pos_weight_from_labels([1, 1]) == 1.0
    assert pos_weight_from_labels([0]) == 1.0
