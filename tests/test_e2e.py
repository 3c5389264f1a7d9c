"""End-to-end integration: the full two-stage pipeline plus the baseline,
on a tiny synthetic corpus with a tiny random encoder.

Bonafide clips are sine tones, spoof clips are white noise — linearly
separable after any reasonable embedding — so the pipeline must drive the
final score-file EER to ~0. This exercises every layer: protocol parsing,
audio IO, balanced sampling, the jitted train steps, extraction, stage-2,
score files and the EER stack (the reference's pipeline contract,
SURVEY.md §3.3).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import BaselineConfig, Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.eval import extract, metrics, score
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import (
    BaselineTrainer,
    Stage1Trainer,
    stage2_scores,
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

STAGE1_CFG = Stage1Config(
    epochs=3, batch_size=8, head_lr=5e-3, seed=7,
    input_dim=32, hidden_dim=16, max_duration_seconds=1,
    use_rawboost=False, finetune_encoder=False, temperature=0.2,
    compute_dtype="float32", warmup_epochs=1, alpha_ramp_epochs=2,
    alpha_end=0.5,
)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny")
    rng = np.random.default_rng(3)
    lines = []
    for i in range(32):
        name = f"clip_{i:04d}.wav"
        bona = i % 2 == 0
        if bona:
            f0 = 200 + 40 * (i % 5)
            x = 0.4 * np.sin(2 * np.pi * f0 * np.arange(SR) / SR)
        else:
            x = 0.2 * rng.standard_normal(SR)
        write_wav(root / name, x.astype(np.float32), SR)
        label = "bonafide" if bona else "spoof"
        attack = "-" if bona else f"A{(i % 3) + 1:02d}"
        lines.append(f"x/{name} {attack} {label} - SPK{i % 4}")
    (root / "protocol.txt").write_text("\n".join(lines) + "\n")
    return root


def make_ds(root, n=None):
    return parse_asvspoof2019(
        str(root / "protocol.txt"), str(root), num_samples=n,
        audio=AudioConfig(SR, 1),
    )


@pytest.fixture(scope="module")
def stage1_run(tiny_corpus, tmp_path_factory):
    save = str(tmp_path_factory.mktemp("ckpt"))
    ds = make_ds(tiny_corpus)
    trainer = Stage1Trainer(STAGE1_CFG, enc_config=TINY_ENC)
    state = trainer.init_state()
    train_pipe = BatchPipeline(ds, STAGE1_CFG.batch_size, seed=7, num_workers=2)
    dev_pipe = BatchPipeline(ds, STAGE1_CFG.batch_size, seed=8, num_workers=2)
    state, history = trainer.fit(state, train_pipe, dev_pipe, save_dir=save)
    return trainer, state, history, save, ds


def test_stage1_trains_and_checkpoints(stage1_run):
    trainer, state, history, save, ds = stage1_run
    assert len(history["train_loss"]) == 3
    assert np.isfinite(history["train_loss"]).all()
    # separable data: loss must improve from epoch 1 to 3
    assert history["train_loss"][-1] < history["train_loss"][0]
    # alpha schedule: warmup 1 epoch, then ramps
    assert history["alpha"] == [0.0, 0.25, 0.5]
    assert os.path.isdir(os.path.join(save, "best"))
    assert os.path.isdir(os.path.join(save, "latest"))

    restored = trainer.restore(save, "latest")
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_two_stage_pipeline(stage1_run, tmp_path):
    trainer, state, _, _, ds = stage1_run
    pipe = BatchPipeline(ds, 8, num_workers=2)

    # ---- extraction (idempotent) ----
    emb_dir = str(tmp_path / "emb")
    embed_fn = lambda w: trainer.embed_step(
        state.params, state.frozen, {"waveforms": jnp.asarray(w)}
    )
    p1 = extract.extract_embeddings(embed_fn, pipe, emb_dir, "train")
    extract.extract_embeddings(embed_fn, pipe, emb_dir, "train")  # skip path
    embs, labels = extract.load_embeddings(emb_dir, "train")
    assert embs.shape == (32, 16) and labels.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-5)

    # ---- stage-2 classifier ----
    cfg2 = Stage2Config(epochs=30, batch_size=16, lr=5e-2, patience=10, seed=0)
    head_params, hist2 = train_stage2(
        cfg2, embs, labels, embs, labels, save_dir=str(tmp_path / "s2")
    )
    assert min(e for e in hist2["dev_eer"] if e is not None) <= 0.1

    # ---- score file + EER ----
    logits = stage2_scores(cfg2, head_params, embs)
    sc_path = str(tmp_path / "scores" / "score_cm_eval.txt")
    score.write_cm_scores(sc_path, labels, logits, utt_prefix="asv_eval")
    eer = metrics.calculate_eer_from_file(sc_path)
    assert eer <= 10.0  # separable toy data -> near-zero EER


def test_stage1_finetune_and_device_rawboost(tiny_corpus):
    cfg = STAGE1_CFG.replace(
        finetune_encoder=True, use_rawboost=True, rawboost_mode="device",
        rawboost_prob=1.0, epochs=1,
    )
    ds = make_ds(tiny_corpus, n=16)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, cfg.batch_size, seed=1, num_workers=2)
    enc_before = jax.device_get(state.params["encoder"])
    state, history = trainer.fit(state, pipe)
    enc_after = jax.device_get(state.params["encoder"])
    # encoder params actually moved (finetune path is live)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(enc_before),
                        jax.tree_util.tree_leaves(enc_after))
    )
    assert moved
    assert np.isfinite(history["train_loss"]).all()


def test_baseline_trainer(tiny_corpus, tmp_path):
    cfg = BaselineConfig(
        epochs=4, batch_size=8, patience=3, seed=5, input_dim=32,
        hidden_dim=16, max_duration_seconds=1, use_rawboost=False,
        finetune_encoder=False, compute_dtype="float32",
    )
    ds = make_ds(tiny_corpus)
    trainer = BaselineTrainer(cfg, enc_config=TINY_ENC, pos_weight=1.0)
    state = trainer.init_state()
    train_pipe = BatchPipeline(ds, cfg.batch_size, seed=5, num_workers=2)
    dev_pipe = BatchPipeline(ds, cfg.batch_size, seed=6, num_workers=2)
    state, history = trainer.fit(state, train_pipe, dev_pipe,
                                 save_dir=str(tmp_path / "bl"))
    assert np.isfinite(history["train_loss"]).all()
    assert min(history["dev_eer"]) <= 0.25  # separable toy data
    assert os.path.isdir(str(tmp_path / "bl" / "baseline_best"))

    logits, labels = trainer.score_dataset(state, dev_pipe)
    assert logits.shape == (32,) and labels.shape == (32,)


def test_extract_encoder_features(stage1_run, tmp_path):
    trainer, state, _, _, ds = stage1_run
    pipe = BatchPipeline(ds, 8, num_workers=2)

    def layer_mean_fn(w):
        enc_p = state.frozen["encoder"]
        out = trainer.encoder.apply({"params": enc_p}, jnp.asarray(w))
        return out["layer_mean"]

    emb_path, lab_path = extract.extract_encoder_features(
        layer_mean_fn, pipe, str(tmp_path / "raw"), "train", rawboost=None
    )
    feats = np.load(emb_path, mmap_mode="r")
    assert feats.shape == (32, 32, extract.FIXED_TIME_DIM)
    assert np.isfinite(np.asarray(feats[:2])).all()


def test_fit_profile_dir_writes_trace(tiny_corpus, tmp_path):
    """`fit(profile_dir=...)` captures a 4-step jax.profiler trace (steps
    2-5; step 1 excluded as compile) and training completes normally.

    batch_size=4 gives 8 steps/epoch so the IN-LOOP window close (sync +
    stop at step 5 + '[PROFILE]' log) runs — not just the end-of-epoch
    fallback stop (review r3). Single-device mesh: batch 4 cannot
    dp-shard over the virtual 8-device mesh."""
    import glob

    from wav2vec_contr_loss_tpu.parallel import make_mesh

    ds = make_ds(tiny_corpus)
    cfg = STAGE1_CFG.replace(epochs=1, batch_size=4)
    mesh1 = make_mesh(devices=np.array(jax.devices()[:1]))
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC, mesh=mesh1)
    pipe = BatchPipeline(ds, cfg.batch_size, seed=7, num_workers=2)
    prof = str(tmp_path / "prof")
    logs = []
    _, hist = trainer.fit(trainer.init_state(), pipe, profile_dir=prof,
                          log_fn=logs.append)
    assert len(hist["train_loss"]) == 1
    assert any("[PROFILE]" in str(m) for m in logs), \
        "in-loop profiler stop path never ran"
    xplanes = glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane trace under {prof}"


def test_fit_profile_dir_epoch_ends_inside_window(tiny_corpus, tmp_path):
    """Fallback stop path: with batch 8 the 32-clip corpus yields only 4
    steps, so the epoch ends INSIDE the profiling window (steps 2-5) and
    the end-of-epoch stop (drain sync + stop_trace, no '[PROFILE]' log)
    must still produce a usable trace."""
    import glob

    ds = make_ds(tiny_corpus)
    trainer = Stage1Trainer(STAGE1_CFG.replace(epochs=1), enc_config=TINY_ENC)
    pipe = BatchPipeline(ds, STAGE1_CFG.batch_size, seed=7, num_workers=2)
    prof = str(tmp_path / "prof")
    logs = []
    _, hist = trainer.fit(trainer.init_state(), pipe, profile_dir=prof,
                          log_fn=logs.append)
    assert len(hist["train_loss"]) == 1
    assert not any("[PROFILE]" in str(m) for m in logs)  # in-loop stop unmet
    xplanes = glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane trace under {prof}"
