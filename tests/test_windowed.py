"""Windowed long-clip scoring: the reference throws away everything past
the first max_duration seconds (base_audio.py:39-45 pad-or-trim); the
opt-in windowed mode scores the full clip via overlapping fixed-length
windows on ONE static-shape compiled graph.

Contract: short clips degenerate to plain scoring; long clips equal
per-window scoring + host aggregation; cli.serve --windowed streams the
same numbers in input order.
"""

import numpy as np

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.eval.serving import SpoofScorer, window_waveform
from wav2vec_contr_loss_tpu.models.heads import build_head
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import Stage1Trainer

SR = 16000
TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(10, 8),  # stride product 80: T=200, not 1599
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.float32, apply_spec_augment=False,
)


import pytest


@pytest.fixture(scope="module")
def tiny_scorer():
    # module-scoped: the jitted scoring graph compiles once for all tests
    cfg = Stage1Config(batch_size=4, finetune_encoder=False,
                       use_rawboost=False, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, compute_dtype="float32")
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    cfg2 = Stage2Config(hidden_dim=16)
    head = build_head(cfg2.head_type, cfg2.hidden_dim, cfg2.dropout)
    head_params = head.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.hidden_dim)))["params"]
    return SpoofScorer(trainer, state, cfg2, head_params)


def test_window_waveform_shapes():
    t, hop = 100, 40
    # short: one zero-padded window (the reference's pad path)
    w = window_waveform(np.ones(60, np.float32), t, hop)
    assert w.shape == (1, t)
    assert w[0, :60].all() and not w[0, 60:].any()
    # exact length: one window, no padding
    w = window_waveform(np.ones(t, np.float32), t, hop)
    assert w.shape == (1, t)
    # long: starts at 0, hop, ... plus an end-aligned tail window
    x = np.arange(250, dtype=np.float32)
    w = window_waveform(x, t, hop)
    np.testing.assert_array_equal(w[:, 0], [0, 40, 80, 120, 150])
    np.testing.assert_array_equal(w[-1], x[150:250])
    # hop divides exactly: no duplicate tail window
    w = window_waveform(np.arange(180, dtype=np.float32), t, hop)
    np.testing.assert_array_equal(w[:, 0], [0, 40, 80])


def test_score_long_equals_per_window_scoring(tiny_scorer):
    scorer = tiny_scorer
    rng = np.random.default_rng(0)
    short = rng.normal(0, 0.2, 12000).astype(np.float32)
    long1 = rng.normal(0, 0.2, int(2.6 * SR)).astype(np.float32)
    long2 = rng.normal(0, 0.2, 3 * SR).astype(np.float32)

    got = scorer.score_long_waveforms([short, long1, long2],
                                      hop_seconds=0.5, agg="mean", batch=4)

    # short clip == plain (padded) scoring
    padded = np.zeros((1, SR), np.float32)
    padded[0, :12000] = short
    np.testing.assert_allclose(got[0], scorer.score_waveforms(padded)[0],
                               atol=1e-5)
    # long clips == score each window independently, then aggregate
    for want_idx, wave in ((1, long1), (2, long2)):
        wins = window_waveform(wave, SR, SR // 2)
        per = scorer.score_waveforms(wins)
        np.testing.assert_allclose(got[want_idx], per.mean(), atol=1e-5)

    # min aggregation: as fake as the fakest window
    got_min = scorer.score_long_waveforms([long1], hop_seconds=0.5,
                                          agg="min", batch=4)
    wins = window_waveform(long1, SR, SR // 2)
    np.testing.assert_allclose(
        got_min[0], scorer.score_waveforms(wins).min(), atol=1e-5)


def test_cli_serve_windowed(tmp_path, capsys, tiny_scorer):
    """--windowed mean streams full-clip scores in input order: mixed
    short/long clips, static batch, numbers equal score_long_waveforms."""
    from wav2vec_contr_loss_tpu.cli.serve import score_paths_windowed
    from wav2vec_contr_loss_tpu.data.audio import AudioConfig, write_wav

    scorer = tiny_scorer
    rng = np.random.default_rng(4)
    lens = [12000, int(2.4 * SR), SR, 3 * SR, 7000]
    waves, paths = [], []
    for i, n in enumerate(lens):
        w = (0.3 * rng.standard_normal(n)).astype(np.float32)
        path = tmp_path / f"w{i}.wav"
        write_wav(path, w, SR)
        waves.append(w)
        paths.append(str(path))
    # corrupted input: zero-waveform fallback, scored, never crashes
    bad = tmp_path / "corrupt.wav"
    bad.write_bytes(b"not audio")
    paths.append(str(bad))

    got = list(score_paths_windowed(scorer, paths, batch=4,
                                    audio_config=AudioConfig(SR, 1),
                                    hop_seconds=0.5, agg="mean"))
    assert [p for p, _ in got] == paths  # input order
    # compare against the DECODED clips (write_wav quantizes to 16-bit PCM)
    from wav2vec_contr_loss_tpu.data.audio import AudioLoader
    full_loader = AudioLoader(AudioConfig(SR, None))
    decoded = [full_loader.load(p) for p in paths]
    want = scorer.score_long_waveforms(decoded, hop_seconds=0.5, agg="mean",
                                       batch=4)
    np.testing.assert_allclose([lg for _, lg in got], want, atol=1e-5)

    # max_clip_seconds caps the windowed length per clip (bounds the host
    # RAM a pathological multi-hour file could pin): capped at the 1 s
    # window, every clip degenerates to plain first-window scoring
    got_cap = list(score_paths_windowed(scorer, paths, batch=4,
                                        audio_config=AudioConfig(SR, 1),
                                        hop_seconds=0.5, agg="mean",
                                        max_clip_seconds=1.0))
    want_cap = scorer.score_long_waveforms([d[:SR] for d in decoded],
                                           hop_seconds=0.5, agg="mean",
                                           batch=4)
    np.testing.assert_allclose([lg for _, lg in got_cap], want_cap,
                               atol=1e-5)
