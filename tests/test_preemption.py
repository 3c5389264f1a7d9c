"""Graceful preemption: SIGTERM -> cooperative mid-epoch save -> exact
replay-resume.

The strong claim under test: a run preempted mid-epoch and resumed from
the saved cursor produces BIT-IDENTICAL final parameters to an
uninterrupted run — the full train state (params + optimizer + step +
PRNG) round-trips through the checkpoint, and the data pipeline replays
the sampler/augmentation stream deterministically past the cursor
(data/pipeline.py train_epoch(skip=...), per-(seed,epoch,batch) host
RawBoost rng). The reference loses everything since the last epoch-end
torch.save and has no resume at all (reference: train_stage1.py:99-133).
"""

import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import BaselineConfig, Stage1Config
from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.data.rawboost import RawBoostParams
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import BaselineTrainer, Stage1Trainer
from wav2vec_contr_loss_tpu.train import checkpoint as ckpt
from wav2vec_contr_loss_tpu.utils.preemption import PreemptionGuard

SR = 16000
TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
    conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, dtype=jnp.float32,
    apply_spec_augment=False,
)

CFG = Stage1Config(
    epochs=2, batch_size=8, head_lr=5e-3, seed=7,
    input_dim=32, hidden_dim=16, max_duration_seconds=1,
    use_rawboost=False, finetune_encoder=False, temperature=0.2,
    compute_dtype="float32", warmup_epochs=1, alpha_ramp_epochs=2,
    alpha_end=0.5,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_corpus")
    rng = np.random.default_rng(11)
    lines = []
    for i in range(32):
        name = f"clip_{i:04d}.wav"
        bona = i % 2 == 0
        if bona:
            x = 0.4 * np.sin(2 * np.pi * (220 + 30 * (i % 4))
                             * np.arange(SR) / SR)
        else:
            x = 0.2 * rng.standard_normal(SR)
        write_wav(root / name, x.astype(np.float32), SR)
        label = "bonafide" if bona else "spoof"
        attack = "-" if bona else f"A{(i % 3) + 1:02d}"
        lines.append(f"x/{name} {attack} {label} - SPK{i % 4}")
    (root / "protocol.txt").write_text("\n".join(lines) + "\n")
    return root


def make_ds(root):
    return parse_asvspoof2019(str(root / "protocol.txt"), str(root),
                              num_samples=None, audio=AudioConfig(SR, 1))


def make_pipe(ds, seed=7, rawboost=None):
    return BatchPipeline(ds, CFG.batch_size, seed=seed, num_workers=2,
                         rawboost=rawboost)


class StepGuard:
    """Deterministic stand-in for PreemptionGuard: request a stop once the
    epoch's batch cursor reaches `k` (duck-typed: fit only calls
    requested(step))."""

    def __init__(self, k: int):
        self.k = k

    def requested(self, step=None):
        return step is not None and step >= self.k


def params_equal(a, b) -> bool:
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return len(leaves_a) == len(leaves_b) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves_a, leaves_b)
    )


# ----------------------------------------------------------------- guard


def test_guard_sigterm_sets_flag_and_restores_handler():
    sentinel = []
    prev = signal.signal(signal.SIGTERM, lambda *a: sentinel.append(1))
    try:
        with PreemptionGuard() as guard:
            assert not guard.requested()
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested()
            assert guard.requested(step=3)  # any-step poll stays true
        # context exit restored the previous handler
        assert signal.getsignal(signal.SIGTERM) is not signal.SIG_DFL
        os.kill(os.getpid(), signal.SIGTERM)
        assert sentinel == [1]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_double_install_restores_original_handler():
    """install() then `with guard:` must still restore the ORIGINAL
    handler on exit — a second install recording the guard's own handler
    as 'previous' would leak it permanently (review r3 finding)."""
    sentinel = []
    prev = signal.signal(signal.SIGTERM, lambda *a: sentinel.append(1))
    try:
        guard = PreemptionGuard().install()
        with guard:
            pass
        os.kill(os.getpid(), signal.SIGTERM)
        assert sentinel == [1]  # original handler, not the guard's
        assert not guard.requested()
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_mark_is_programmatic_request():
    guard = PreemptionGuard()
    assert not guard.requested(step=1)
    guard.mark()
    assert guard.requested(step=1)


# -------------------------------------------------------------- pipeline


def test_train_epoch_skip_replays_exact_stream(corpus):
    """skip=k yields exactly the batches k.. of the full epoch, including
    the host-RawBoost draws (per-(seed,epoch,batch) rng)."""
    ds = make_ds(corpus)
    rb = RawBoostParams(sample_rate=SR, prob=1.0)
    full = list(make_pipe(ds, rawboost=rb).train_epoch(3))
    part = list(make_pipe(ds, rawboost=rb).train_epoch(3, skip=2))
    assert len(part) == len(full) - 2
    for a, b in zip(full[2:], part):
        assert np.array_equal(a.waveforms, b.waveforms)
        assert np.array_equal(a.labels, b.labels)
        assert a.names == b.names


def test_resume_cursor_semantics():
    assert ckpt.resume_cursor({"epoch": 5}) == (6, 0)
    assert ckpt.resume_cursor(
        {"epoch": 5, "preempted": True, "batches_done": 3}) == (5, 3)


# ----------------------------------------------------- stage-1 trainer


def test_stage1_mid_epoch_resume_bit_identical(corpus, tmp_path):
    ds = make_ds(corpus)

    # uninterrupted run
    trainer_a = Stage1Trainer(CFG, enc_config=TINY_ENC)
    state_a, hist_a = trainer_a.fit(trainer_a.init_state(), make_pipe(ds))
    assert "preempted" not in hist_a

    # preempted at epoch 1, batch 2
    save = str(tmp_path / "ckpt")
    trainer_b = Stage1Trainer(CFG, enc_config=TINY_ENC)
    state_b, hist_b = trainer_b.fit(
        trainer_b.init_state(), make_pipe(ds), save_dir=save,
        preemption=StepGuard(2))
    assert hist_b.get("preempted") is True
    m = ckpt.load_sidecar(save, "latest")["metrics"]
    assert m["preempted"] and m["epoch"] == 1 and m["batches_done"] == 2

    # resume past the cursor and finish
    trainer_c = Stage1Trainer(CFG, enc_config=TINY_ENC)
    state_c = trainer_c.restore(save, "latest")
    start_epoch, skip = ckpt.resume_cursor(m)
    state_c, hist_c = trainer_c.fit(
        state_c, make_pipe(ds), save_dir=save,
        start_epoch=start_epoch, skip_steps=skip,
        best_dev=float(m.get("best_dev", float("inf"))))

    assert params_equal(state_a.params, state_c.params)
    assert int(state_a.step) == int(state_c.step)


def test_stage1_best_dev_carries_across_resume(corpus, tmp_path):
    """A resumed run must not re-capture 'best' with a worse dev loss:
    best_dev rides the sidecar."""
    ds = make_ds(corpus)
    save = str(tmp_path / "ckpt")
    trainer = Stage1Trainer(CFG, enc_config=TINY_ENC)
    _, _ = trainer.fit(trainer.init_state(), make_pipe(ds),
                       dev_pipe=make_pipe(ds, seed=8), save_dir=save)
    m = ckpt.load_sidecar(save, "latest")["metrics"]
    assert "best_dev" in m and np.isfinite(m["best_dev"])
    # the recorded carry equals the best dev loss seen so far
    assert m["best_dev"] <= m["dev_loss"] or np.isnan(m["dev_loss"])


# ----------------------------------------------------- baseline trainer


def test_baseline_mid_epoch_resume_bit_identical(corpus, tmp_path):
    ds = make_ds(corpus)
    bcfg = BaselineConfig(
        input_dim=32, hidden_dim=16, max_duration_seconds=1, epochs=2,
        batch_size=8, seed=7, use_rawboost=False, finetune_encoder=False,
        compute_dtype="float32", patience=10,
    )

    def pipes():
        return (BatchPipeline(ds, bcfg.batch_size, seed=7, num_workers=2),
                BatchPipeline(ds, bcfg.batch_size, seed=9, num_workers=2))

    trainer_a = BaselineTrainer(bcfg, enc_config=TINY_ENC)
    tr, dv = pipes()
    state_a, hist_a = trainer_a.fit(trainer_a.init_state(), tr, dv)

    save = str(tmp_path / "bl")
    trainer_b = BaselineTrainer(bcfg, enc_config=TINY_ENC)
    tr, dv = pipes()
    _, hist_b = trainer_b.fit(trainer_b.init_state(), tr, dv,
                              save_dir=save, preemption=StepGuard(2))
    assert hist_b.get("preempted") is True
    m = ckpt.load_sidecar(save, "baseline_latest")["metrics"]
    assert m["preempted"] and m["batches_done"] == 2

    trainer_c = BaselineTrainer(bcfg, enc_config=TINY_ENC)
    state_c = trainer_c.restore(save, "baseline_latest")
    start_epoch, skip = ckpt.resume_cursor(m)
    tr, dv = pipes()
    state_c, _ = trainer_c.fit(
        state_c, tr, dv, save_dir=save, start_epoch=start_epoch,
        skip_steps=skip, best_eer=float(m.get("best_eer", float("inf"))),
        epochs_no_improve=int(m.get("epochs_no_improve", 0)))

    assert params_equal(state_a.params, state_c.params)


def test_fit_without_save_dir_still_stops(corpus):
    """A preemption request must end fit even when nothing can be saved —
    the latched flag may not leak into 'one step + full dev eval per
    remaining epoch' (review regression)."""
    ds = make_ds(corpus)
    trainer = Stage1Trainer(CFG, enc_config=TINY_ENC)
    state, hist = trainer.fit(trainer.init_state(), make_pipe(ds),
                              dev_pipe=make_pipe(ds, seed=8),
                              preemption=StepGuard(2))
    assert hist.get("preempted") is True
    assert int(state.step) == 2  # stopped at the request, not epochs later
    assert hist["dev_loss"] == []  # no post-preemption dev sweeps


def test_baseline_resume_after_early_stop_is_noop(corpus):
    ds = make_ds(corpus)
    bcfg = BaselineConfig(
        input_dim=32, hidden_dim=16, max_duration_seconds=1, epochs=5,
        batch_size=8, seed=7, use_rawboost=False, finetune_encoder=False,
        compute_dtype="float32", patience=2,
    )
    trainer = BaselineTrainer(bcfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    tr = BatchPipeline(ds, 8, seed=7, num_workers=2)
    dv = BatchPipeline(ds, 8, seed=9, num_workers=2)
    logs = []
    state, hist = trainer.fit(state, tr, dv, epochs_no_improve=2,
                              best_eer=0.1, log_fn=logs.append)
    assert hist["train_loss"] == []  # not one extra epoch
    assert any("already reached" in m for m in logs)


def test_cli_preemption_exits_75_and_resumes(corpus, tmp_path):
    """CLI contract: SIGTERM -> graceful save -> exit code 75
    (EX_TEMPFAIL), so run_pipeline/run_sweep/schedulers never continue a
    chain on a half-trained model; a --resume rerun completes with 0."""
    import subprocess
    import sys

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    args = [sys.executable, "-m", "wav2vec_contr_loss_tpu.cli.train_stage1",
            "--model_name", "test/tiny-wav2vec2", "--encoder_init", "random",
            "--save_dir", str(tmp_path / "ckpt"),
            "--train_root", str(corpus),
            "--train_protocol", str(corpus / "protocol.txt"),
            "--epochs", "20", "--batch_size", "8",
            "--max_duration_seconds", "1", "--input_dim", "32",
            "--hidden_dim", "16", "--num_workers", "2"]
    p = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    out, killed = [], False
    for line in p.stdout:
        out.append(line)
        if not killed and line.startswith("[epoch 0"):
            p.send_signal(signal.SIGTERM)
            killed = True
    rc = p.wait(timeout=300)
    out = "".join(out)
    assert killed, out
    assert rc == 75, (rc, out[-2000:])
    assert "[PREEMPTED]" in out

    r = subprocess.run(args + ["--resume"], env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "[RESUME] continuing from epoch" in r.stdout
    assert "[epoch 020]" in r.stdout and "training complete" in r.stdout
