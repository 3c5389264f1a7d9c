"""Pallas fused SupCon kernel vs the XLA implementation: loss values and
gradients must agree to fp32 precision across similarities, mining depths,
alpha blends, uniformity weights, and degenerate batches. Runs in pallas
interpreter mode on CPU, compiled on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.losses import SupConConfig, supcon_binary_loss
from wav2vec_contr_loss_tpu.ops.supcon_pallas import supcon_binary_loss_pallas


def normed(rng, b, d):
    z = rng.normal(size=(b, d)).astype(np.float32)
    return z / np.linalg.norm(z, axis=1, keepdims=True)


CASES = [
    # (B, D, labels_kind, tau, sim, topk, alpha, lam)
    (16, 8, "balanced", 0.2, "cosine", 15, 0.0, 0.0),
    (16, 8, "balanced", 0.07, "geodesic", 15, 0.0, 0.0),
    (16, 8, "balanced", 0.2, "cosine", 4, 0.5, 0.0),
    (16, 8, "balanced", 0.6, "geodesic", 100, 1.0, 0.0),
    (16, 8, "balanced", 0.2, "cosine", 15, 0.3, 0.2),
    (12, 6, "one_odd", 0.2, "cosine", 15, 0.7, 0.0),
    (10, 6, "all_same", 0.2, "cosine", 15, 0.5, 0.05),
    (8, 4, "distinct", 0.2, "cosine", 15, 0.5, 0.1),
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
    return np.arange(b)


@pytest.mark.parametrize("b,d,lk,tau,sim,topk,alpha,lam", CASES)
def test_pallas_matches_xla(rng, b, d, lk, tau, sim, topk, alpha, lam):
    z = normed(rng, b, d)
    labels = make_labels(lk, b, rng)
    cfg = SupConConfig(temperature=tau, similarity=sim, topk_neg=topk,
                       uniformity_weight=lam, uniformity_t=2.0)

    want = float(supcon_binary_loss(z, labels, alpha, cfg))
    got = float(supcon_binary_loss_pallas(z, labels, alpha, cfg))
    assert got == pytest.approx(want, rel=2e-5, abs=2e-5)

    g_want = jax.grad(lambda x: supcon_binary_loss(x, labels, alpha, cfg))(z)
    g_got = jax.grad(
        lambda x: supcon_binary_loss_pallas(x, labels, jnp.asarray(alpha), cfg)
    )(z)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=5e-4, atol=5e-6)


def test_large_batch_falls_back_to_xla(rng):
    """Beyond the VMEM envelope the wrapper must route to XLA and still
    agree with it exactly."""
    z = normed(rng, 600, 32)
    labels = make_labels("balanced", 600, rng)
    cfg = SupConConfig(temperature=0.2, topk_neg=15)
    got = float(supcon_binary_loss_pallas(z, labels, 0.3, cfg))
    want = float(supcon_binary_loss(z, labels, 0.3, cfg))
    assert got == want  # same computation, same graph


def test_pallas_alpha_gradient(rng):
    """d(loss)/d(alpha) must equal L_mined - L_full."""
    z = normed(rng, 16, 8)
    labels = make_labels("balanced", 16, rng)
    cfg = SupConConfig(temperature=0.2, topk_neg=5)

    ga = jax.grad(
        lambda a: supcon_binary_loss_pallas(z, labels, a, cfg), argnums=0
    )(jnp.asarray(0.3))
    l_full = float(supcon_binary_loss(z, labels, 0.0, cfg))
    l_mined = float(supcon_binary_loss(z, labels, 1.0, cfg))
    assert float(ga) == pytest.approx(l_mined - l_full, rel=1e-4, abs=1e-5)


def test_pallas_under_jit_and_value_and_grad(rng):
    z = normed(rng, 32, 16)
    labels = make_labels("balanced", 32, rng)
    cfg = SupConConfig(temperature=0.07, similarity="geodesic", topk_neg=8,
                       uniformity_weight=0.05)

    @jax.jit
    def f(z):
        return jax.value_and_grad(
            lambda x: supcon_binary_loss_pallas(x, labels, 0.4, cfg)
        )(z)

    loss, grad = f(z)
    want_loss, want_grad = jax.value_and_grad(
        lambda x: supcon_binary_loss(x, labels, 0.4, cfg)
    )(z)
    assert float(loss) == pytest.approx(float(want_loss), rel=2e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                               rtol=5e-4, atol=5e-6)
