"""Shared CLI plumbing: path flags, encoder bootstrapping, dataset builders."""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

from ..config import run_tag
from ..data import AudioConfig, parse_asvspoof2019, parse_in_the_wild
from ..models.wav2vec2 import LARGE_960H, XLSR_300M, Wav2Vec2Config

import jax.numpy as jnp

# tiny architecture for smoke tests / CI (random init only)
TINY_TEST = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16, 16, 16), conv_kernel=(10, 3, 3, 3, 3),
    conv_stride=(5, 2, 2, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, dtype=jnp.float32,
    apply_spec_augment=False,
)

KNOWN_ARCHS = {
    "facebook/wav2vec2-xls-r-300m": XLSR_300M,
    "facebook/wav2vec2-large-960h": LARGE_960H,
    "test/tiny-wav2vec2": TINY_TEST,
}


def add_asv_paths(p: argparse.ArgumentParser, dev: bool = True,
                  eval_: bool = False, itw: bool = False) -> None:
    p.add_argument("--train_root", type=str, default="")
    p.add_argument("--train_protocol", type=str, default="")
    if dev:
        p.add_argument("--dev_root", type=str, default="")
        p.add_argument("--dev_protocol", type=str, default="")
    if eval_:
        p.add_argument("--eval_root", type=str, default="")
        p.add_argument("--eval_protocol", type=str, default="")
    if itw:
        p.add_argument("--itw_root", type=str, default="")
        p.add_argument("--itw_protocol", type=str, default="")


def add_encoder_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--model_name", type=str, default="facebook/wav2vec2-xls-r-300m",
        help="HF id or local snapshot dir for the Wav2Vec2 encoder",
    )
    p.add_argument(
        "--encoder_init", type=str, default="pretrained",
        help="'pretrained' = convert the HF checkpoint (needs cache/"
             "network); 'random' = architecture-only init (smoke tests); "
             "anything else = path to an Orbax encoder written by "
             "cli.convert_hf_checkpoint (offline ingestion)",
    )


def build_encoder(model_name: str, encoder_init: str
                  ) -> Tuple[Wav2Vec2Config, Optional[dict]]:
    """-> (enc_config, enc_params or None for random init).

    `encoder_init` is 'pretrained' (HF cache/network), 'random', or a
    path to an Orbax encoder checkpoint written offline by
    cli.convert_hf_checkpoint — that last leg makes the air-gapped
    environment a file drop away from real weights."""
    if encoder_init not in ("pretrained", "random"):
        from ..models.hf_convert import load_encoder_init

        return load_encoder_init(encoder_init)  # a missing path is an error
    if encoder_init == "pretrained":
        from ..models.hf_convert import load_pretrained

        try:
            return load_pretrained(model_name)
        except Exception as e:
            print(f"[WARN] could not load pretrained {model_name!r} ({e}); "
                  f"falling back to random init")
    cfg = KNOWN_ARCHS.get(model_name, XLSR_300M)
    return cfg, None


def save_dir_for(base: str, model_name: str) -> str:
    """<save_dir>/<run_tag> subdirectory convention
    (reference: stage1_config.py:185-186)."""
    import os

    return os.path.join(base, run_tag(model_name))


def asv_dataset(root: str, protocol: str, num_samples=None, subset="all",
                seconds: int = 5, sr: int = 16000):
    return parse_asvspoof2019(
        protocol, root, subset=subset, num_samples=num_samples,
        audio=AudioConfig(sr, seconds),
    )


def itw_dataset(root: str, protocol: str, num_samples=None,
                seconds: int = 5, sr: int = 16000):
    return parse_in_the_wild(
        protocol, root, num_samples=num_samples,
        audio=AudioConfig(sr, seconds),
    )
