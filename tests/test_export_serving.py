"""jax.export serving artifact: self-contained scoring without model code.

Contract: `SpoofScorer.export` -> bytes -> `load_exported` reproduces the
live scorer's logits on the exported (batch, T) signature, including the
int16 wire and int8-quantized variants, and the CLI writes a loadable
file. (The reference has no export story — deployment is Python + torch +
checkpoints; SURVEY.md §3.3.)
"""

import numpy as np

import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.eval.serving import SpoofScorer, load_exported
from wav2vec_contr_loss_tpu.models.heads import build_head
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.ops.wire import quantize_wire
from wav2vec_contr_loss_tpu.train import Stage1Trainer

TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(10, 8),  # stride product 80: T=200, not 1599
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.float32, apply_spec_augment=False,
)


import pytest


def _tiny_scorer(quantize="none"):
    import jax

    cfg = Stage1Config(batch_size=4, finetune_encoder=False,
                       use_rawboost=False, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, compute_dtype="float32")
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    cfg2 = Stage2Config(hidden_dim=16)
    head = build_head(cfg2.head_type, cfg2.hidden_dim, cfg2.dropout)
    head_params = head.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.hidden_dim)))["params"]
    return SpoofScorer(trainer, state, cfg2, head_params, quantize=quantize)


@pytest.fixture(scope="module")
def tiny_scorer():
    # module-scoped: built/compiled once for the plain-scorer tests
    return _tiny_scorer()


def _waves(batch=4, t=16000):
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (batch, t)).astype(np.float32)
    w[:, 12000:] = 0.0
    return w


def test_export_roundtrip(tmp_path, tiny_scorer):
    scorer = tiny_scorer
    waves = _waves()
    want = scorer.score_waveforms(waves)

    blob = scorer.export(batch=4, platforms=("cpu",))
    path = tmp_path / "scorer.jaxexport"
    path.write_bytes(blob)
    fn = load_exported(str(path))
    got = np.asarray(fn(jnp.asarray(waves)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # the JSON header makes the file self-describing (sample rate is not
    # recoverable from the input aval); bare blobs still load (spec
    # fields None)
    from wav2vec_contr_loss_tpu.eval.serving import ExportSpec, _unwrap_export
    _, spec = load_exported(str(path), with_spec=True)
    assert spec == ExportSpec(4, 16000, "float32", 16000, "none")
    raw, header = _unwrap_export(blob)
    assert header["sample_rate"] == 16000
    (tmp_path / "bare.jaxexport").write_bytes(raw)
    _, bare_spec = load_exported(str(tmp_path / "bare.jaxexport"),
                                 with_spec=True)
    assert bare_spec == ExportSpec(4, 16000, "float32", None, None)


def test_export_int16_wire_and_quantized(tmp_path):
    scorer = _tiny_scorer(quantize="w8")
    waves = _waves()
    want = scorer.score_waveforms(waves, wire="int16")

    blob = scorer.export(batch=4, wire="int16", platforms=("cpu",))
    path = tmp_path / "scorer_w8.jaxexport"
    path.write_bytes(blob)
    fn = load_exported(str(path))
    got = np.asarray(fn(jnp.asarray(quantize_wire(waves))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_w8a8(tmp_path):
    """w8a8 bakes int8 weights AND the dynamic per-token activation-quant
    ops into the serialized graph — a different StableHLO surface than
    the bf16/w8 paths."""
    scorer = _tiny_scorer(quantize="w8a8")
    waves = _waves()
    want = scorer.score_waveforms(waves)

    blob = scorer.export(batch=4, platforms=("cpu",))
    path = tmp_path / "scorer_w8a8.jaxexport"
    path.write_bytes(blob)
    got = np.asarray(load_exported(str(path))(jnp.asarray(waves)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    _, spec = load_exported(str(path), with_spec=True)
    assert spec.quantize == "w8a8"


def test_serve_from_artifact(tmp_path, capsys, tiny_scorer):
    """cli.serve --artifact: daemon scores from the exported file alone —
    batch, clip length, and wire format recovered from the baked input
    signature, logits equal to the live scorer's."""
    from wav2vec_contr_loss_tpu.cli.serve import main as serve_main
    from wav2vec_contr_loss_tpu.data.audio import write_wav

    scorer = tiny_scorer
    blob = scorer.export(batch=4, wire="int16", platforms=("cpu",))
    art = tmp_path / "scorer.jaxexport"
    art.write_bytes(blob)

    rng = np.random.default_rng(7)
    paths = []
    for i in range(5):  # 5 clips at batch 4: exercises tail padding
        w = (0.3 * rng.standard_normal(16000)).astype(np.float32)
        path = tmp_path / f"a{i}.wav"
        write_wav(path, w, 16000)
        paths.append(str(path))
    (tmp_path / "list.txt").write_text("\n".join(paths) + "\n")

    # flags that conflict with the baked signature are rejected, not
    # silently overridden
    for bad in (["--wire", "float32"], ["--batch", "64"],
                ["--target_sample_rate", "8000"],
                ["--quantize", "w8"]):
        with pytest.raises(SystemExit):
            serve_main(["--artifact", str(art),
                        "--list", str(tmp_path / "list.txt")] + bad)

    capsys.readouterr()
    serve_main(["--artifact", str(art), "--list", str(tmp_path / "list.txt")])
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert [l.split("\t")[0] for l in out_lines] == paths

    from wav2vec_contr_loss_tpu.data.audio import AudioConfig, AudioLoader
    loader = AudioLoader(AudioConfig(16000, 1))
    waves = np.stack([loader.load(p) for p in paths])
    want = scorer.score_waveforms(
        np.concatenate([waves, np.zeros((3, 16000), np.float32)]),
        wire="int16")[:5]
    np.testing.assert_allclose([float(l.split("\t")[1]) for l in out_lines],
                               want, atol=1e-5)


def test_export_cli_platforms_fail_fast(tmp_path):
    """Malformed --platforms is rejected by argparse BEFORE the expensive
    checkpoint load; spaces and trailing commas are tolerated."""
    from wav2vec_contr_loss_tpu.cli import export_serving

    for bad in ("tpu,warp", "", ","):
        with pytest.raises(SystemExit):
            export_serving.main([
                "--stage1_dir", "/nonexistent", "--stage2_dir",
                "/nonexistent", "--out", str(tmp_path / "x"),
                "--platforms", bad])
    # 'tpu, cpu' must NOT die in argparse (it proceeds to the checkpoint
    # load, which fails on the bogus dir — proving parsing accepted it)
    with pytest.raises((FileNotFoundError, ValueError, OSError)):
        export_serving.main([
            "--stage1_dir", str(tmp_path / "missing"), "--stage2_dir",
            str(tmp_path / "missing"), "--out", str(tmp_path / "x"),
            "--platforms", "tpu, cpu,"])


def test_export_cli(tmp_path):
    """CLI writes a loadable artifact from real checkpoints."""
    import jax

    from wav2vec_contr_loss_tpu.cli import export_serving
    from wav2vec_contr_loss_tpu.data import (
        AudioConfig, BatchPipeline, parse_asvspoof2019)
    from wav2vec_contr_loss_tpu.data.audio import write_wav
    from wav2vec_contr_loss_tpu.train import train_stage2

    SR = 16000
    rng = np.random.default_rng(5)
    lines = []
    for i in range(8):
        name = f"c{i:03d}.wav"
        x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(SR) / SR)
             if i % 2 == 0 else 0.2 * rng.standard_normal(SR))
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        lines.append(f"d/{name} {'-' if i % 2 == 0 else 'A01'} "
                     f"{'bonafide' if i % 2 == 0 else 'spoof'} - S0")
    (tmp_path / "p.txt").write_text("\n".join(lines) + "\n")
    ds = parse_asvspoof2019(str(tmp_path / "p.txt"), str(tmp_path),
                            audio=AudioConfig(SR, 1))

    cfg = Stage1Config(epochs=1, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=False, compute_dtype="float32",
                       seed=0)
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, _ = trainer.fit(state, pipe, save_dir=str(tmp_path / "s1"))
    embs, labels = trainer.embed_dataset(state, pipe)
    train_stage2(Stage2Config(epochs=2, batch_size=8, seed=0), embs, labels,
                 embs, labels, save_dir=str(tmp_path / "s2"))

    out = str(tmp_path / "scorer.jaxexport")
    export_serving.main([
        "--stage1_dir", str(tmp_path / "s1"),
        "--stage2_dir", str(tmp_path / "s2"),
        "--out", out, "--batch", "8", "--platforms", "cpu",
    ])
    fn = load_exported(out)
    scorer = SpoofScorer.from_checkpoints(str(tmp_path / "s1"),
                                          str(tmp_path / "s2"))
    waves = _waves(batch=8)  # divisible by the 8-device test mesh
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(waves))),
                               scorer.score_waveforms(waves), atol=1e-5)
