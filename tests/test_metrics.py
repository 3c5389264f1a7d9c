"""Golden tests for the EER / DET / t-DCF stack.

The committed score files of the reference repo are exact oracles: the EER
values below were recomputed from them with the reference's own algorithm
(see BASELINE.md). Our implementation must reproduce them bit-for-bit.
"""

import os

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.eval import metrics, score

# (relative score file path, expected EER %) — from BASELINE.md
GOLDEN_EERS = [
    ("scores/baseline/facebook/wav2vec2-xls-r-300m/score_cm_eval.txt", 0.285),
    ("scores/baseline/facebook/wav2vec2-xls-r-300m/score_cm_itw.txt", 15.935),
    ("scores/supcon_geodesic_temp_0.07/facebook/wav2vec2-xls-r-300m/score_cm_eval.txt", 0.191),
    ("scores/supcon_temp_0.6/facebook/wav2vec2-xls-r-300m/score_cm_itw.txt", 9.097),
    ("scores/supcon/facebook/wav2vec2-xls-r-300m/score_cm_eval.txt", 0.299),
]


@pytest.mark.parametrize("rel_path,expected_eer", GOLDEN_EERS)
def test_eer_matches_reference_score_files(reference_dir, rel_path, expected_eer):
    path = os.path.join(reference_dir, rel_path)
    if not os.path.exists(path):
        pytest.skip(f"missing {rel_path}")
    eer = metrics.calculate_eer_from_file(path)
    assert abs(eer - expected_eer) < 5e-4, f"{rel_path}: {eer} != {expected_eer}"


def test_det_curve_shapes_and_endpoints(rng):
    tar = rng.normal(1.0, 1.0, 300)
    non = rng.normal(-1.0, 1.0, 500)
    frr, far, thr = metrics.compute_det_curve(tar, non)
    assert frr.shape == far.shape == thr.shape == (801,)
    assert frr[0] == 0.0 and far[0] == 1.0
    assert frr[-1] == 1.0 and far[-1] == 0.0
    # monotonic
    assert np.all(np.diff(frr) >= 0)
    assert np.all(np.diff(far) <= 0)
    assert np.all(np.diff(thr) >= 0)


def test_eer_separable_and_random(rng):
    # perfectly separable -> EER 0
    eer, _ = metrics.compute_eer(np.array([2.0, 3.0]), np.array([-1.0, 0.0]))
    assert eer == 0.0
    # identical distributions -> EER ~0.5
    x = rng.normal(size=4000)
    eer, _ = metrics.compute_eer(x[:2000], x[2000:])
    assert abs(eer - 0.5) < 0.05


def test_threshold_sweep_matches_det_eer(rng):
    """The baseline's duplicate-score sweep and the DET-curve EER agree.

    Exactly equal on distinct scores; on heavily tied scores the two
    algorithms (both present in the reference) pick operating points within
    one tie-group of each other, so allow a small tolerance there.
    """
    for trial in range(5):
        scores = rng.normal(size=400)
        labels = (rng.random(400) < 0.4).astype(int)
        labels[:2] = [0, 1]  # both classes present
        eer_sweep, _ = metrics.eer_threshold_sweep(labels, scores)
        eer_det, _ = metrics.compute_eer(scores[labels == 1], scores[labels == 0])
        assert abs(eer_sweep - eer_det) < 1e-12

        tied = np.round(scores, 2)
        eer_sweep, _ = metrics.eer_threshold_sweep(labels, tied)
        eer_det, _ = metrics.compute_eer(tied[labels == 1], tied[labels == 0])
        assert abs(eer_sweep - eer_det) < 5e-3


def test_tdcf_sanity(rng):
    bona = rng.normal(2.0, 1.0, 500)
    spoof = rng.normal(-2.0, 1.0, 800)
    tdcf, thr = metrics.compute_tdcf(
        bona, spoof, pfa_asv=0.01, pmiss_asv=0.01, pmiss_spoof_asv=0.9
    )
    assert tdcf.shape == thr.shape
    assert float(tdcf.min()) >= 0.0
    assert float(tdcf.min()) < 0.3  # well-separated scores -> small min-tDCF

    with pytest.raises(ValueError):
        metrics.compute_tdcf(bona, spoof, 0.01, 0.01, None)
    with pytest.raises(ValueError):
        metrics.compute_tdcf(
            np.array([1.0, 1.0]), np.array([0.0, 0.0]), 0.01, 0.01, 0.9
        )


def test_binary_classification_metrics_against_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    scores = rng.random(1000)
    labels = (rng.random(1000) < 0.3).astype(int)
    acc, auc, eer = metrics.binary_classification_metrics(labels, scores)
    ref_auc = sklearn.roc_auc_score(labels, scores)
    assert auc == pytest.approx(ref_auc, abs=1e-12)
    fpr, tpr, _ = sklearn.roc_curve(labels, scores, drop_intermediate=False)
    fnr = 1.0 - tpr
    ref_eer = 0.5 * (fpr + fnr)[np.argmin(np.abs(fnr - fpr))]
    assert eer == pytest.approx(ref_eer, abs=2e-3)


def test_tdcf_matches_reference_implementation(reference_dir, rng):
    """Full t-DCF curve vs the reference's implementation, imported as an
    oracle (evaluation.py:83-255)."""
    import importlib.util
    import os
    import sys

    path = os.path.join(reference_dir, "evaluation.py")
    spec = importlib.util.spec_from_file_location("ref_eval", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_eval"] = mod
    spec.loader.exec_module(mod)

    bona = rng.normal(1.5, 1.0, 400)
    spoof = rng.normal(-1.5, 1.2, 700)
    cm = metrics.ASVSPOOF2019_COST_MODEL
    cost_model = dict(Ptar=cm.Ptar, Pnon=cm.Pnon, Pspoof=cm.Pspoof,
                      Cmiss_asv=cm.Cmiss_asv, Cfa_asv=cm.Cfa_asv,
                      Cmiss_cm=cm.Cmiss_cm, Cfa_cm=cm.Cfa_cm)
    want_tdcf, want_thr = mod.compute_tDCF(
        bona, spoof, 0.05, 0.02, 0.85, cost_model, print_cost=False
    )
    got_tdcf, got_thr = metrics.compute_tdcf(bona, spoof, 0.05, 0.02, 0.85, cm)
    np.testing.assert_allclose(got_tdcf, want_tdcf, rtol=1e-12)
    np.testing.assert_allclose(got_thr, want_thr, rtol=1e-12)

    # DET curves bit-exact too
    f1, a1, t1 = mod.compute_det_curve(bona, spoof)
    f2, a2, t2 = metrics.compute_det_curve(bona, spoof)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_obtain_asv_error_rates():
    tar = np.array([1.0, 2.0, 3.0, 4.0])
    non = np.array([-1.0, 0.5, 2.5])
    spoof = np.array([0.0, 3.0])
    pfa, pmiss, pmiss_spoof = metrics.obtain_asv_error_rates(tar, non, spoof, 2.0)
    assert pfa == pytest.approx(1 / 3)
    assert pmiss == pytest.approx(1 / 4)
    assert pmiss_spoof == pytest.approx(1 / 2)
    assert metrics.obtain_asv_error_rates(tar, non, np.array([]), 2.0)[2] is None


def test_score_file_roundtrip(tmp_path):
    labels = np.array([1, 0, 1, 0, 0])
    scores = np.array([3.14159265, -2.5, 0.0, 1e-7, -1e3])
    path = str(tmp_path / "score_cm_eval.txt")
    score.write_cm_scores(path, labels, scores, utt_prefix="asv_eval")
    rec = score.read_score_file(path)
    assert len(rec) == 5
    assert rec.utt_ids[0] == "asv_eval_000000"
    assert rec.utt_ids[4] == "asv_eval_000004"
    assert list(rec.keys) == ["bonafide", "spoof", "bonafide", "spoof", "spoof"]
    assert np.allclose(rec.scores, np.round(scores, 6))
    assert rec.bonafide_scores.size == 2 and rec.spoof_scores.size == 3


def test_bootstrap_eer_ci(rng):
    """Seeded determinism; the CI brackets the point EER for a clean
    separable set and shrinks with more trials."""
    tar = rng.normal(2.0, 1.0, 400)
    non = rng.normal(-2.0, 1.0, 600)
    point = metrics.compute_eer(tar, non)[0]
    lo, hi = metrics.bootstrap_eer_ci(tar, non, n_boot=200, seed=7)
    lo2, hi2 = metrics.bootstrap_eer_ci(tar, non, n_boot=200, seed=7)
    assert (lo, hi) == (lo2, hi2)  # deterministic
    assert 0.0 <= lo <= point <= hi <= 1.0
    # 10x the trials at the same separation -> tighter interval
    big_t = rng.normal(2.0, 1.0, 4000)
    big_n = rng.normal(-2.0, 1.0, 6000)
    blo, bhi = metrics.bootstrap_eer_ci(big_t, big_n, n_boot=200, seed=7)
    assert (bhi - blo) < (hi - lo)
    with pytest.raises(ValueError):
        metrics.bootstrap_eer_ci(tar, np.array([]), n_boot=10)
    with pytest.raises(ValueError):
        metrics.bootstrap_eer_ci(tar, non, n_boot=10, ci=0.0)


def test_threshold_at_far(rng):
    """The returned threshold meets the FAR budget with the lowest FRR on
    the curve; extremes behave (FAR budget 1.0 -> accept-all corner)."""
    tar = rng.normal(2.0, 1.0, 500)
    non = rng.normal(-2.0, 1.0, 500)
    thr, frr, far = metrics.threshold_at_far(tar, non, 0.01)
    assert far <= 0.01
    # applying the threshold reproduces the reported rates
    assert np.mean(non > thr) == pytest.approx(far)
    assert np.mean(tar <= thr) == pytest.approx(frr)
    # tightening the budget can only raise FRR
    thr2, frr2, far2 = metrics.threshold_at_far(tar, non, 0.001)
    assert far2 <= 0.001 and frr2 >= frr
    t0, f0, a0 = metrics.threshold_at_far(tar, non, 1.0)
    assert f0 == 0.0 and a0 == 1.0  # the accept-everything corner
    with pytest.raises(ValueError):
        metrics.threshold_at_far(tar, non, 5.0)


def test_asv_operating_point_and_tdcf_hand_computed(tmp_path):
    """ASV score file -> EER-threshold operating point -> min-tDCF, against
    a fully hand-computed example (the official methodology the CLI's
    --asv_scores path implements; reference: evaluation.py:26-43).

    ASV: tar=[2,3,4,5], non=[0,1] -> DET hits frr=far=0 at threshold 1
    (eer_asv=0); at that threshold pfa_asv=1/2 (the non trial AT 1 is
    accepted, >=), pmiss_asv=0, pmiss_spoof_asv=1/2 (spoof=[-1,6]).
    Cost model (ASVspoof2019 LA): c1 = 0.9405*(1-0) - 0.0095*10*0.5
    = 0.893; c2 = 10*0.05*(1-0.5) = 0.25.
    CM: bona=[1,3,4,5], spoof=[0,2,2.5] -> the best threshold sits at 0
    (pmiss_cm=0, pfa_cm=2/3): tdcf_norm = 0.25*(2/3)/0.25 = 2/3."""
    from wav2vec_contr_loss_tpu.eval import metrics

    asv = tmp_path / "asv_scores.txt"
    asv.write_text("\n".join([
        "bonafide target 2.0", "bonafide target 3.0",
        "bonafide target 4.0", "bonafide target 5.0",
        "bonafide nontarget 0.0", "bonafide nontarget 1.0",
        "A01 spoof -1.0", "A02 spoof 6.0", "",
    ]))
    tar, non, spoof = metrics.read_asv_score_file(str(asv))
    assert tar.tolist() == [2, 3, 4, 5]
    assert non.tolist() == [0, 1] and spoof.tolist() == [-1, 6]

    pfa, pmiss, pmiss_spoof, eer_asv, thr = (
        metrics.asv_operating_point_from_scores(tar, non, spoof))
    assert (eer_asv, thr) == (0.0, 1.0)
    assert (pfa, pmiss, pmiss_spoof) == (0.5, 0.0, 0.5)

    tdcf, _ = metrics.compute_tdcf(
        np.array([1.0, 3.0, 4.0, 5.0]), np.array([0.0, 2.0, 2.5]),
        pfa, pmiss, pmiss_spoof)
    np.testing.assert_allclose(float(tdcf.min()), 2.0 / 3.0, rtol=1e-12)


def test_read_asv_score_file_rejects_garbage(tmp_path):
    from wav2vec_contr_loss_tpu.eval import metrics

    bad_key = tmp_path / "bad_key.txt"
    bad_key.write_text("bonafide targett 1.0\n")
    with pytest.raises(ValueError, match="unknown ASV trial keys"):
        metrics.read_asv_score_file(str(bad_key))

    bad_score = tmp_path / "bad_score.txt"
    bad_score.write_text("bonafide target notanumber\n")
    with pytest.raises(ValueError, match="not a score"):
        metrics.read_asv_score_file(str(bad_score))

    # a plain ASV score file without spoof trials (or missing any class)
    # must fail with a usable message, not a downstream TypeError
    no_spoof = tmp_path / "no_spoof.txt"
    no_spoof.write_text("bonafide target 1.0\nbonafide nontarget -1.0\n")
    with pytest.raises(ValueError, match="no spoof trials"):
        metrics.read_asv_score_file(str(no_spoof))
