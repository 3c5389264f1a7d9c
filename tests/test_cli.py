"""CLI integration: the full pipeline driver (train -> extract -> plots ->
stage-2 -> scores -> EER) on a tiny synthetic corpus — the reference's
train_stage1.sbatch flow (SURVEY.md §3.3) exercised through the public CLI
surface in one process."""

import os

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.data.audio import write_wav

SR = 16000


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    rng = np.random.default_rng(11)
    lines = []
    for i in range(24):
        name = f"clip_{i:04d}.wav"
        bona = i % 2 == 0
        if bona:
            x = 0.4 * np.sin(2 * np.pi * (220 + 30 * (i % 4)) * np.arange(SR) / SR)
        else:
            x = 0.2 * rng.standard_normal(SR)
        write_wav(root / name, x.astype(np.float32), SR)
        attack = "-" if bona else f"A{(i % 3) + 1:02d}"
        label = "bonafide" if bona else "spoof"
        lines.append(f"d/{name} {attack} {label} - SPK{i % 4}")
    (root / "protocol.txt").write_text("\n".join(lines) + "\n")
    return root


def test_run_pipeline_cli(cli_corpus, tmp_path):
    from wav2vec_contr_loss_tpu.cli import run_pipeline

    work = str(tmp_path / "exp")
    proto = str(cli_corpus / "protocol.txt")
    root = str(cli_corpus)
    run_pipeline.main([
        "--exp_name", "supcon_temp_0.07",
        "--model_name", "test/tiny-wav2vec2",
        "--encoder_init", "random",
        "--work_dir", work,
        "--train_root", root, "--train_protocol", proto,
        "--dev_root", root, "--dev_protocol", proto,
        "--eval_root", root, "--eval_protocol", proto,
        "--epochs", "2", "--batch_size", "8",
        "--max_duration_seconds", "1",
        "--input_dim", "32", "--hidden_dim", "16",
        # hot stage-2 (the e2e tests' Stage2Config): the tiny corpus is
        # separable, so the pipeline must drive EER to ~0 — and a score
        # orientation bug (inverted vs keys) must read as 100, not pass
        "--stage2_lr", "5e-2", "--stage2_epochs", "40",
    ])

    exp = os.path.join(work, "supcon_temp_0.07")
    tag = "test__tiny-wav2vec2"
    ckpt = os.path.join(exp, "checkpoints_stage1", tag, "best")
    assert os.path.isdir(ckpt)
    for split in ("train", "dev", "eval"):
        assert os.path.exists(
            os.path.join(exp, "embeddings", f"{split}_embeddings.npy")
        )
    assert os.path.exists(os.path.join(exp, "plots", "umap_eval.png"))
    score_file = os.path.join(exp, "scores", "supcon_temp_0.07", tag,
                              "score_cm_eval.txt")
    assert os.path.exists(score_file)

    from wav2vec_contr_loss_tpu.eval.metrics import calculate_eer_from_file

    eer = calculate_eer_from_file(score_file)
    assert eer <= 10.0  # separable corpus: near-zero, and NOT inverted

    # --stage1_ckpt: an existing checkpoint dir (the
    # convert_reference_checkpoint handoff) must SKIP the training leg
    # and still drive extraction -> stage-2 -> scoring to the same EER
    def boom(*a, **k):
        raise AssertionError("training leg must be skipped")

    orig = run_pipeline.train_stage1.main
    run_pipeline.train_stage1.main = boom
    try:
        work2 = str(tmp_path / "exp2")
        run_pipeline.main([
            "--exp_name", "supcon_temp_0.07",
            "--model_name", "test/tiny-wav2vec2",
            "--work_dir", work2,
            "--stage1_ckpt", os.path.dirname(ckpt),
            "--train_root", root, "--train_protocol", proto,
            "--dev_root", root, "--dev_protocol", proto,
            "--eval_root", root, "--eval_protocol", proto,
            "--skip_plots",
            "--stage2_lr", "5e-2", "--stage2_epochs", "40",
        ])
    finally:
        run_pipeline.train_stage1.main = orig
    score2 = os.path.join(work2, "supcon_temp_0.07", "scores",
                          "supcon_temp_0.07", tag, "score_cm_eval.txt")
    assert os.path.exists(score2)
    assert calculate_eer_from_file(score2) <= 10.0

    # attack-type-colored UMAP from the saved multi-labels + attack map
    from wav2vec_contr_loss_tpu.cli import plot_umap

    emb_dir = os.path.join(exp, "embeddings")
    assert os.path.exists(os.path.join(emb_dir, "eval_multi_labels.npy"))
    plot_umap.main(["--emb_dir", emb_dir, "--split", "eval", "--by_attack",
                    "--out_dir", os.path.join(exp, "plots_attack")])
    assert os.path.exists(os.path.join(exp, "plots_attack", "umap_eval.png"))


def test_eval_scores_cli(tmp_path, capsys):
    from wav2vec_contr_loss_tpu.cli import eval_scores
    from wav2vec_contr_loss_tpu.eval.score import write_cm_scores

    rng = np.random.default_rng(0)
    labels = np.array([1] * 50 + [0] * 80)
    scores = np.where(labels == 1, rng.normal(2, 1, 130), rng.normal(-2, 1, 130))
    path = str(tmp_path / "score_cm_eval.txt")
    write_cm_scores(path, labels, scores, utt_prefix="asv_eval")
    eval_scores.main([path, "--tdcf", "--asv_operating_point",
                      "0.01", "0.01", "0.9"])
    out = capsys.readouterr().out
    assert "EER" in out and "min-tDCF" in out

    # the official path: operating point derived from an ASV score file
    # at the ASV system's EER threshold (reference: evaluation.py:26-43)
    asv_path = str(tmp_path / "asv_scores.txt")
    asv_rng = np.random.default_rng(1)
    with open(asv_path, "w") as f:
        for s in asv_rng.normal(3, 1, 40):
            f.write(f"bonafide target {s}\n")
        for s in asv_rng.normal(-3, 1, 40):
            f.write(f"bonafide nontarget {s}\n")
        for s in asv_rng.normal(-1, 1, 40):
            f.write(f"A01 spoof {s}\n")
    eval_scores.main([path, "--tdcf", "--asv_scores", asv_path])
    out = capsys.readouterr().out
    assert "ASV EER" in out and "min-tDCF" in out

    # --tdcf without an operating-point source (or with both) fails fast
    import pytest

    with pytest.raises(SystemExit):
        eval_scores.main([path, "--tdcf"])
    capsys.readouterr()
    with pytest.raises(SystemExit):
        eval_scores.main([path, "--tdcf", "--asv_scores", asv_path,
                          "--asv_operating_point", "0.01", "0.01", "0.9"])
    capsys.readouterr()
    # ...and an operating-point source WITHOUT --tdcf is a loud error,
    # not silently ignored work
    with pytest.raises(SystemExit):
        eval_scores.main([path, "--asv_scores", asv_path])
    capsys.readouterr()


def test_run_pipeline_stage1_ckpt_rejects_training_flags(capsys):
    """--stage1_ckpt skips the training leg; combining it with flags
    that only configure training must error, not silently drop them."""
    import pytest

    from wav2vec_contr_loss_tpu.cli import run_pipeline

    with pytest.raises(SystemExit) as e:
        run_pipeline.main([
            "--exp_name", "supcon_temp_0.07",
            "--stage1_ckpt", "/some/ckpt",
            "--epochs", "10", "--resume",
        ])
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "--epochs" in err and "--resume" in err
    assert "stage1_ckpt skips" in err.replace("--", "").replace("`", "") \
        or "TRAINING" in err


def test_eval_scores_bootstrap_and_by_attack(tmp_path, capsys):
    """--bootstrap adds a CI line; --by_attack pairs an ASV19 protocol
    positionally and reports per-attack EERs (A02 separable -> 0%, A01
    overlapping -> worse); count/key mismatches fail fast."""
    from wav2vec_contr_loss_tpu.cli import eval_scores
    from wav2vec_contr_loss_tpu.eval.score import write_cm_scores

    rng = np.random.default_rng(1)
    # protocol order: 40 bonafide, 30 A01 (overlapping), 30 A02 (separable)
    labels = np.array([1] * 40 + [0] * 60)
    attacks = ["-"] * 40 + ["A01"] * 30 + ["A02"] * 30
    scores = np.concatenate([
        rng.normal(1.0, 1.0, 40),    # bonafide
        rng.normal(0.5, 1.0, 30),    # A01: heavy overlap
        rng.normal(-6.0, 0.5, 30),   # A02: clean separation
    ])
    proto = str(tmp_path / "protocol.txt")
    with open(proto, "w") as f:
        for i, (att, lab) in enumerate(zip(attacks, labels)):
            key = "bonafide" if lab == 1 else "spoof"
            f.write(f"LA_E_{i:06d} {att} {key} - SPK{i % 5}\n")
    path = str(tmp_path / "score_cm_eval.txt")
    write_cm_scores(path, labels, scores, utt_prefix="asv_eval")

    eval_scores.main([path, "--bootstrap", "50", "--by_attack", proto])
    out = capsys.readouterr().out
    assert "95% CI [" in out
    a01 = next(l for l in out.splitlines() if l.strip().startswith("A01:"))
    a02 = next(l for l in out.splitlines() if l.strip().startswith("A02:"))
    assert "(n=30)" in a01 and "(n=30)" in a02
    eer_a01 = float(a01.split("=")[1].split("%")[0])
    eer_a02 = float(a02.split("=")[1].split("%")[0])
    assert eer_a02 == 0.0 and eer_a01 > 10.0

    # trial-count mismatch fails fast
    with open(proto, "a") as f:
        f.write("LA_E_999999 A03 spoof - SPK0\n")
    with pytest.raises(SystemExit, match="positional"):
        eval_scores.main([path, "--by_attack", proto])

    # key disagreement (right count, wrong protocol) fails fast
    proto2 = str(tmp_path / "protocol_swapped.txt")
    with open(proto2, "w") as f:
        for i, (att, lab) in enumerate(zip(attacks, labels)):
            key = "spoof" if lab == 1 else "bonafide"  # inverted keys
            f.write(f"LA_E_{i:06d} {att} {key} - SPK{i % 5}\n")
    with pytest.raises(SystemExit, match="disagree"):
        eval_scores.main([path, "--by_attack", proto2])


def test_eval_scores_det_plot(tmp_path, capsys):
    """--det writes one probit-axis DET PNG over all inputs; more curves
    than distinguishable series fails fast."""
    from wav2vec_contr_loss_tpu.cli import eval_scores
    from wav2vec_contr_loss_tpu.eval.score import write_cm_scores

    rng = np.random.default_rng(2)
    paths = []
    for k, sep in enumerate((4.0, 1.0)):
        labels = np.array([1] * 60 + [0] * 60)
        scores = np.concatenate([rng.normal(sep, 1.0, 60),
                                 rng.normal(0.0, 1.0, 60)])
        p = str(tmp_path / f"exp{k}" / "score_cm_eval.txt")
        os.makedirs(os.path.dirname(p))
        write_cm_scores(p, labels, scores, utt_prefix="asv_eval")
        paths.append(p)
    out = str(tmp_path / "det.png")
    eval_scores.main(paths + ["--det", out])
    assert os.path.getsize(out) > 10_000  # a real rendered figure
    capsys.readouterr()

    many = paths * 5  # 10 curves > the 8 fixed series slots
    with pytest.raises(SystemExit, match="distinguishable"):
        eval_scores.main(many + ["--det", str(tmp_path / "det2.png")])
