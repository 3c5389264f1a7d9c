"""Property-based SupCon testing (hypothesis): random batch sizes, dims,
label patterns, temperatures, mining depths and alphas must all match the
serial numpy oracle — fuzzing the edge-rule space beyond the fixed cases in
test_losses.py."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tests.test_losses import np_supcon_binary
from wav2vec_contr_loss_tpu.losses import SupConConfig, supcon_binary_loss


@settings(max_examples=40, deadline=None)
@given(
    b=st.integers(2, 20),
    d=st.integers(2, 12),
    tau=st.sampled_from([0.05, 0.07, 0.2, 0.6, 1.0]),
    sim=st.sampled_from(["cosine", "geodesic"]),
    topk=st.integers(1, 40),
    alpha=st.floats(0.0, 1.0),
    lam=st.sampled_from([0.0, 0.05, 0.2]),
    label_seed=st.integers(0, 2**31),
    z_seed=st.integers(0, 2**31),
)
def test_supcon_matches_oracle_fuzz(b, d, tau, sim, topk, alpha, lam,
                                    label_seed, z_seed):
    zr = np.random.default_rng(z_seed)
    z = zr.normal(size=(b, d)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    lr = np.random.default_rng(label_seed)
    labels = (lr.random(b) < lr.uniform(0.0, 1.0)).astype(np.int32)

    cfg = SupConConfig(temperature=tau, similarity=sim, topk_neg=topk,
                       uniformity_weight=lam, uniformity_t=2.0)
    got = float(supcon_binary_loss(z, labels, alpha, cfg))
    want = np_supcon_binary(z.astype(np.float64), labels, tau, sim, topk,
                            alpha, lam, 2.0)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@settings(max_examples=40, deadline=None)
@given(
    n_tar=st.integers(20, 200),
    n_non=st.integers(20, 200),
    sep=st.floats(0.0, 4.0),
    seed=st.integers(0, 2**31),
)
def test_eer_properties_fuzz(n_tar, n_non, sep, seed):
    """EER invariants (for non-degenerate class sizes — with a handful of
    trials the min-|frr-far| point can legally exceed 1/2): bounded, and
    symmetric under score negation + class swap up to granularity."""
    from wav2vec_contr_loss_tpu.eval.metrics import compute_eer

    rng = np.random.default_rng(seed)
    tar = rng.normal(sep, 1.0, n_tar)
    non = rng.normal(0.0, 1.0, n_non)
    eer, thr = compute_eer(tar, non)
    # hard bound: min |frr - far| point lies in [0, 1]; the 1/2 bound only
    # holds asymptotically (small samples fluctuate above it)
    assert 0.0 <= eer <= 1.0
    # negating scores and swapping classes mirrors the DET curve: EER is
    # preserved up to one granularity step of the rarer class
    eer_sym, _ = compute_eer(-non, -tar)
    assert abs(eer - eer_sym) <= 1.0 / min(n_tar, n_non) + 1e-12
