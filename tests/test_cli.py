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
    eval_scores.main([path, "--tdcf"])
    out = capsys.readouterr().out
    assert "EER" in out and "min-tDCF" in out
