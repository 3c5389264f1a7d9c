"""verify_parity harness: PASS/FAIL logic against prewritten score files."""

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.cli import verify_parity
from wav2vec_contr_loss_tpu.config import EXPERIMENT_PRESETS
from wav2vec_contr_loss_tpu.eval.score import write_cm_scores


def make_scores(path, eer_target, n_bona=500, n_spoof=800, seed=0):
    """Synthesize scores with a controllable EER (mix fraction of confused
    labels)."""
    rng = np.random.default_rng(seed)
    bona = rng.normal(3.0, 0.5, n_bona)
    spoof = rng.normal(-3.0, 0.5, n_spoof)
    flip = int(eer_target / 100 * min(n_bona, n_spoof))
    bona[:flip], spoof[:flip] = spoof[:flip].copy(), bona[:flip].copy()
    labels = np.concatenate([np.ones(n_bona, int), np.zeros(n_spoof, int)])
    scores = np.concatenate([bona, spoof])
    write_cm_scores(str(path), labels, scores, utt_prefix="asv_eval")


def test_reference_table_covers_presets():
    assert set(verify_parity.REFERENCE_EER) == set(EXPERIMENT_PRESETS)


def test_pass_and_fail(tmp_path):
    d = tmp_path / "scores"
    # supcon reference eval EER = 0.299
    make_scores(d / "score_cm_eval.txt", 0.3)
    with pytest.raises(SystemExit) as e:
        verify_parity.main(["--exp_name", "supcon", "--scores_dir", str(d)])
    assert e.value.code == 0

    make_scores(d / "score_cm_eval.txt", 5.0)  # way off
    with pytest.raises(SystemExit) as e:
        verify_parity.main(["--exp_name", "supcon", "--scores_dir", str(d)])
    assert e.value.code == 1


def test_missing_scores_fail(tmp_path):
    with pytest.raises(SystemExit) as e:
        verify_parity.main(["--exp_name", "supcon",
                            "--scores_dir", str(tmp_path)])
    assert e.value.code == 1
