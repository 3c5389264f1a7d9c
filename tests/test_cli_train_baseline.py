"""train_baseline CLI smoke test + post-LN ('group' feat-norm, large-960h
style) variant training."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import Stage1Config
from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import Stage1Trainer

SR = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("bl_corpus")
    rng = np.random.default_rng(6)
    lines = []
    for i in range(16):
        name = f"c{i:03d}.wav"
        bona = i % 2 == 0
        x = (0.4 * np.sin(2 * np.pi * 260 * np.arange(SR) / SR) if bona
             else 0.2 * rng.standard_normal(SR))
        write_wav(root / name, x.astype(np.float32), SR)
        lab = "bonafide" if bona else "spoof"
        lines.append(f"d/{name} {'-' if bona else 'A02'} {lab} - S{i % 3}")
    (root / "p.txt").write_text("\n".join(lines) + "\n")
    return root


def test_train_baseline_cli(corpus, tmp_path, monkeypatch):
    """The CLI builds tiny-arch models via --model_name test/tiny-wav2vec2;
    monkeypatch the arch to a 1-second-friendly config and run one epoch."""
    from wav2vec_contr_loss_tpu.cli import common, train_baseline

    tiny = Wav2Vec2Config(
        hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
        conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, dtype=jnp.float32,
        apply_spec_augment=False,
    )
    monkeypatch.setitem(common.KNOWN_ARCHS, "test/tiny-wav2vec2", tiny)

    save = str(tmp_path / "bl")
    train_baseline.main([
        "--model_name", "test/tiny-wav2vec2", "--encoder_init", "random",
        "--train_root", str(corpus), "--train_protocol", str(corpus / "p.txt"),
        "--dev_root", str(corpus), "--dev_protocol", str(corpus / "p.txt"),
        "--save_dir", save, "--epochs", "1", "--batch_size", "8",
        "--use_rawboost", "0", "--finetune_encoder", "0",
        "--remat_encoder", "0", "--num_workers", "2",
    ])
    # cheat: the CLI hardcodes 5 s clips; patch via BaselineConfig default?
    # -> the CLI ran with 5 s padded clips; checkpoint must exist
    tag = "test__tiny-wav2vec2"
    assert os.path.isdir(os.path.join(save, tag, "baseline_best"))


def test_post_ln_group_norm_variant_trains(corpus):
    """large-960h-style architecture (post-LN, group feat norm, no conv
    bias) must train end-to-end too."""
    enc = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16, 16), conv_kernel=(10, 3, 3, 3),
        conv_stride=(5, 2, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, dtype=jnp.float32,
        apply_spec_augment=False,
        do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
    )
    ds = parse_asvspoof2019(str(corpus / "p.txt"), str(corpus),
                            audio=AudioConfig(SR, 1))
    cfg = Stage1Config(epochs=2, batch_size=8, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, use_rawboost=False,
                       finetune_encoder=True, compute_dtype="float32", seed=0)
    trainer = Stage1Trainer(cfg, enc_config=enc)
    state = trainer.init_state()
    pipe = BatchPipeline(ds, 8, seed=0, num_workers=2)
    state, hist = trainer.fit(state, pipe)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
