"""CLI smoke tests for the scorer entry points (famous-figures and
baseline), end-to-end from checkpoints on a tiny synthetic corpus."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import BaselineConfig, Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import (
    BaselineTrainer,
    Stage1Trainer,
    train_stage2,
)

SR = 16000
TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
    conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, dtype=jnp.float32,
    apply_spec_augment=False,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("scorer_corpus")
    rng = np.random.default_rng(4)
    asv_lines = []
    ff_lines = ["AudioName\tSpeaker\tSource\tLabel\tAudioPath"]
    for i in range(16):
        name = f"c{i:03d}.wav"
        bona = i % 2 == 0
        x = (0.4 * np.sin(2 * np.pi * 300 * np.arange(SR) / SR) if bona
             else 0.2 * rng.standard_normal(SR))
        write_wav(root / name, x.astype(np.float32), SR)
        lab = "bonafide" if bona else "spoof"
        asv_lines.append(f"d/{name} {'-' if bona else 'A01'} {lab} - S{i % 3}")
        ff_lines.append(f"{name}\tceleb{i % 2}\tyoutube\t{lab}\t{name}")
    (root / "asv.txt").write_text("\n".join(asv_lines) + "\n")
    (root / "ff.tsv").write_text("\n".join(ff_lines) + "\n")

    ds = parse_asvspoof2019(str(root / "asv.txt"), str(root),
                            audio=AudioConfig(SR, 1))
    cfg1 = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                        max_duration_seconds=1, use_rawboost=False,
                        finetune_encoder=False, compute_dtype="float32", seed=0)
    s1_dir = str(root / "s1")
    trainer = Stage1Trainer(cfg1, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=s1_dir)

    embs, labels = trainer.embed_dataset(state, pipe)
    s2_dir = str(root / "s2")
    train_stage2(Stage2Config(epochs=5, batch_size=16, seed=0),
                 embs, labels, embs, labels, save_dir=s2_dir)

    bcfg = BaselineConfig(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                          max_duration_seconds=1, use_rawboost=False,
                          finetune_encoder=False, compute_dtype="float32",
                          seed=0)
    bl_dir = str(root / "bl")
    btr = BaselineTrainer(bcfg, enc_config=TINY_ENC)
    bstate = btr.init_state()
    bstate, _ = btr.fit(bstate, pipe, BatchPipeline(ds, 8, num_workers=2),
                        save_dir=bl_dir)
    return root, s1_dir, s2_dir, bl_dir


def test_score_famous_figures_cli(setup, tmp_path, capsys):
    root, s1_dir, s2_dir, _ = setup
    from wav2vec_contr_loss_tpu.cli import score_famous_figures

    out_dir = str(tmp_path / "ff_scores")
    score_famous_figures.main([
        "--protocol", str(root / "ff.tsv"), "--root_dir", str(root),
        "--stage1_dir", s1_dir, "--stage2_dir", s2_dir,
        "--scores_dir", out_dir, "--batch_size", "8",
        "--num_workers", "2", "--print_eer",
    ])
    out = capsys.readouterr().out
    assert "EER:" in out
    sc = os.path.join(out_dir, "score_cm_famous_figures.txt")
    assert os.path.exists(sc)
    lines = open(sc).read().splitlines()
    assert len(lines) == 16
    assert lines[0].split()[0].endswith(".wav")  # real audio-name utt ids


def test_score_famous_figures_speaker_filter(setup, tmp_path):
    root, s1_dir, s2_dir, _ = setup
    from wav2vec_contr_loss_tpu.cli import score_famous_figures

    out_dir = str(tmp_path / "ff_scores2")
    score_famous_figures.main([
        "--protocol", str(root / "ff.tsv"), "--root_dir", str(root),
        "--stage1_dir", s1_dir, "--stage2_dir", s2_dir,
        "--scores_dir", out_dir, "--batch_size", "8", "--num_workers", "2",
        "--include_speakers", "celeb0",
    ])
    sc = os.path.join(out_dir, "score_cm_famous_figures.txt")
    assert len(open(sc).read().splitlines()) == 8


def test_score_famous_figures_subset(setup, tmp_path):
    """--subset bonafide keeps only label==bonafide rows
    (reference: eval_famous_figures_score_file.py:186, data_loader.py:84-86)."""
    root, s1_dir, s2_dir, _ = setup
    from wav2vec_contr_loss_tpu.cli import score_famous_figures

    out_dir = str(tmp_path / "ff_scores3")
    score_famous_figures.main([
        "--protocol", str(root / "ff.tsv"), "--root_dir", str(root),
        "--stage1_dir", s1_dir, "--stage2_dir", s2_dir,
        "--scores_dir", out_dir, "--batch_size", "8", "--num_workers", "2",
        "--subset", "bonafide",
    ])
    sc = os.path.join(out_dir, "score_cm_famous_figures.txt")
    lines = open(sc).read().splitlines()
    assert len(lines) == 8
    assert all(ln.split()[2] == "bonafide" for ln in lines)


def test_score_baseline_cli(setup, tmp_path):
    root, _, _, bl_dir = setup
    from wav2vec_contr_loss_tpu.cli import score_baseline

    out_dir = str(tmp_path / "bl_scores")
    score_baseline.main([
        "--ckpt_dir", bl_dir, "--scores_dir", out_dir,
        "--eval_root", str(root), "--eval_protocol", str(root / "asv.txt"),
        "--batch_size", "8", "--num_workers", "2",
    ])
    sc = os.path.join(out_dir, "score_cm_eval.txt")
    lines = open(sc).read().splitlines()
    assert len(lines) == 16
    # skip-if-exists
    score_baseline.main([
        "--ckpt_dir", bl_dir, "--scores_dir", out_dir,
        "--eval_root", str(root), "--eval_protocol", str(root / "asv.txt"),
    ])
    assert len(open(sc).read().splitlines()) == 16
