"""Fused serving path: waveform -> score in one jit must reproduce the
two-stage filesystem pipeline's scores exactly."""

import numpy as np
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.eval.serving import SpoofScorer
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import Stage1Trainer, stage2_scores, train_stage2

SR = 16000
TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
    conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, dtype=jnp.float32,
    apply_spec_augment=False,
)


def test_fused_scorer_matches_pipeline(tmp_path):
    rng = np.random.default_rng(2)
    lines = []
    for i in range(16):
        name = f"c{i:03d}.wav"
        bona = i % 2 == 0
        x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(SR) / SR) if bona
             else 0.2 * rng.standard_normal(SR))
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        lines.append(f"d/{name} {'-' if bona else 'A01'} "
                     f"{'bonafide' if bona else 'spoof'} - S{i % 3}")
    (tmp_path / "p.txt").write_text("\n".join(lines) + "\n")
    ds = parse_asvspoof2019(str(tmp_path / "p.txt"), str(tmp_path),
                            audio=AudioConfig(SR, 1))

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32", seed=0)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=str(tmp_path / "s1"))

    embs, labels = trainer.embed_dataset(state, pipe)
    cfg2 = Stage2Config(epochs=10, batch_size=16, lr=5e-2, seed=0)
    head_params, _ = train_stage2(cfg2, embs, labels, embs, labels,
                                  save_dir=str(tmp_path / "s2"))
    want = stage2_scores(cfg2, head_params, embs)

    scorer = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                          str(tmp_path / "s2"))
    got, got_labels = scorer.score_dataset(pipe)
    np.testing.assert_array_equal(got_labels, labels)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_put_waves_dp_sharding(tmp_path):
    """Serving is mesh-native like extraction: waves shard over 'data'
    when the batch divides it, replicate otherwise (same device set as
    the replicated params either way)."""
    from jax.sharding import PartitionSpec as P

    from wav2vec_contr_loss_tpu.models.heads import build_head
    import jax

    cfg = Stage1Config(batch_size=4, finetune_encoder=False,
                       use_rawboost=False, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, compute_dtype="float32")
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    cfg2 = Stage2Config(hidden_dim=16)
    head = build_head(cfg2.head_type, cfg2.hidden_dim, cfg2.dropout)
    head_params = head.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.hidden_dim)))["params"]
    scorer = SpoofScorer(trainer, state, cfg2, head_params)

    n_data = scorer.mesh.shape.get("data", 1)
    assert n_data > 1  # conftest provides the virtual 8-device mesh

    dp = scorer.put_waves(np.zeros((n_data * 2, SR), np.float32))
    assert dp.sharding.spec == P("data")
    rep = scorer.put_waves(np.zeros((n_data + 1, SR), np.float32))
    assert rep.sharding.spec == P()
    # dp-sharded scoring equals replicated scoring bit-for-bit (no
    # cross-row op in the graph)
    waves = np.random.default_rng(0).normal(
        0, 0.2, (n_data * 2, SR)).astype(np.float32)
    got_dp = np.asarray(scorer._score(scorer.put_waves(waves)))
    got_rep = np.asarray(scorer._score(jax.device_put(
        waves, scorer._waves_rep)))
    np.testing.assert_array_equal(got_dp, got_rep)


def test_bench_serving_smoke(capsys):
    """The serving-latency component bench runs end-to-end on the tiny
    model and emits JSON-serializable numbers."""
    import json

    from wav2vec_contr_loss_tpu.cli.bench_components import bench_serving

    out = bench_serving(batch=2, seconds=1, repeats=2, model="tiny")
    s = json.dumps(out)  # must be JSON-clean
    assert "serving_p50_ms" in s
    assert out["serving_clips_per_sec"] > 0


def test_cli_serve_streams_scores(tmp_path, capsys):
    """cli.serve: paths in -> 'path\\tlogit' lines out, in input order,
    tail batch padded (5 clips at batch 4), corrupted file scored via the
    zero-waveform fallback instead of crashing the stream."""
    rng = np.random.default_rng(3)
    lines = []
    for i in range(8):
        name = f"c{i:03d}.wav"
        x = 0.3 * rng.standard_normal(SR)
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        lines.append(f"d/{name} {'-' if i % 2 else 'A01'} "
                     f"{'bonafide' if i % 2 else 'spoof'} - S{i % 3}")
    (tmp_path / "p.txt").write_text("\n".join(lines) + "\n")
    ds = parse_asvspoof2019(str(tmp_path / "p.txt"), str(tmp_path),
                            audio=AudioConfig(SR, 1))

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32", seed=0)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=str(tmp_path / "s1"))
    embs, labels = trainer.embed_dataset(state, pipe)
    cfg2 = Stage2Config(epochs=5, batch_size=16, lr=5e-2, seed=0)
    train_stage2(cfg2, embs, labels, embs, labels,
                 save_dir=str(tmp_path / "s2"))

    bad = tmp_path / "corrupt.wav"
    bad.write_bytes(b"not a wav file")
    paths = [str(tmp_path / f"c{i:03d}.wav") for i in range(4)] + [str(bad)]
    (tmp_path / "list.txt").write_text("\n".join(paths) + "\n")

    from wav2vec_contr_loss_tpu.cli.serve import main as serve_main

    capsys.readouterr()  # drain the training-setup output
    serve_main(["--stage1_dir", str(tmp_path / "s1"),
                "--stage2_dir", str(tmp_path / "s2"),
                "--list", str(tmp_path / "list.txt"),
                "--batch", "4", "--max_duration_seconds", "1",
                "--threshold", "0.0"])
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(out_lines) == 5
    got = dict(l.split("\t")[:2] for l in out_lines)
    assert [l.split("\t")[0] for l in out_lines] == paths  # input order
    assert all(l.split("\t")[2] in ("bonafide", "spoof") for l in out_lines)

    # parity with direct scoring (incl. the zero-waveform fallback clip)
    scorer = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                          str(tmp_path / "s2"))
    from wav2vec_contr_loss_tpu.data.audio import AudioLoader
    loader = AudioLoader(AudioConfig(SR, 1))
    waves = np.stack([loader.load(p) for p in paths])
    want = scorer.score_waveforms(
        np.concatenate([waves, np.zeros((3, SR), np.float32)]))[:5]
    np.testing.assert_allclose(
        [float(got[p]) for p in paths], want, atol=1e-5)


def test_bench_extract_smoke():
    """The B=32-class extraction bench (overlapped stream path) runs
    end-to-end on the tiny model and emits JSON-clean numbers (r3,
    VERDICT r2 ask #6)."""
    import json

    from wav2vec_contr_loss_tpu.cli.bench_components import bench_extract

    out = bench_extract(batch=4, seconds=1, n_batches=3, model="tiny")
    s = json.dumps(out)
    assert "extract_clips_per_sec" in s
    assert out["extract_clips_per_sec"] > 0
    assert out["extract_batch"] == 4
    # the int8 (quantized-encoder) leg drives the same stream through the
    # quant graph — the runbook's w8a8/w8 extract rows (ops/quant.py)
    qout = bench_extract(batch=4, seconds=1, n_batches=3, model="tiny",
                         quantize="w8a8")
    assert qout["extract_clips_per_sec"] > 0


def test_sp_trained_checkpoint_serves_and_quantizes(tmp_path):
    """Serving a checkpoint trained with sequence_parallel=True must work
    in both the plain and quantized paths: the scorer rebuilds the
    encoder without a mesh, so training-time placement flags (sp, pp)
    must be dropped at bind time (regression: the quantize/pp rebuilds
    kept sequence_parallel=True and hit the encoder's mesh guard)."""
    from wav2vec_contr_loss_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    lines = []
    for i in range(16):
        name = f"c{i:03d}.wav"
        bona = i % 2 == 0
        x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(SR) / SR) if bona
             else 0.2 * rng.standard_normal(SR))
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        lines.append(f"d/{name} {'-' if bona else 'A01'} "
                     f"{'bonafide' if bona else 'spoof'} - S{i % 3}")
    (tmp_path / "p.txt").write_text("\n".join(lines) + "\n")
    ds = parse_asvspoof2019(str(tmp_path / "p.txt"), str(tmp_path),
                            audio=AudioConfig(SR, 1))

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32",
                       seed=0, sequence_parallel=True)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC,
                            mesh=make_mesh(n_model=2))
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=str(tmp_path / "s1"))
    embs, labels = trainer.embed_dataset(state, pipe)
    cfg2 = Stage2Config(epochs=5, batch_size=16, lr=5e-2, seed=0)
    train_stage2(cfg2, embs, labels, embs, labels,
                 save_dir=str(tmp_path / "s2"))

    for quant in ("none", "w8"):
        scorer = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                              str(tmp_path / "s2"),
                                              quantize=quant)
        scores, _ = scorer.score_dataset(pipe)
        assert np.all(np.isfinite(scores)), quant
