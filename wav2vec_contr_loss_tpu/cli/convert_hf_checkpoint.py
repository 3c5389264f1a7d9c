"""Offline pretrained-weights ingestion.

Converts a LOCALLY dropped HuggingFace Wav2Vec2 checkpoint (snapshot
directory, .safetensors, or torch .bin — no network) into persisted Orbax
encoder params every training/eval CLI can consume via
`--encoder_init <out_dir>`:

    python -m wav2vec_contr_loss_tpu.cli.convert_hf_checkpoint \
        --src /drops/wav2vec2-xls-r-300m --out /ckpts/xlsr_init
    python -m wav2vec_contr_loss_tpu.cli.train_stage1 ... \
        --encoder_init /ckpts/xlsr_init

This closes the air-gap between "weights appear on disk" and the
reference's network path `Wav2Vec2Model.from_pretrained`
(reference: encoder.py:21): zero code to write when weights arrive.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=str, required=True,
                   help="HF snapshot dir (config.json + model.safetensors /"
                        " pytorch_model.bin, sharded index supported) or a"
                        " single weights file with config.json beside it")
    p.add_argument("--out", type=str, required=True,
                   help="output directory for the Orbax encoder checkpoint")
    args = p.parse_args(argv)

    from ..models.hf_convert import load_local_hf_checkpoint, save_encoder_init

    cfg, params = load_local_hf_checkpoint(args.src)
    path = save_encoder_init(args.out, cfg, params, source=args.src)

    import jax

    n_params = sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(params))
    print(f"Converted {args.src} -> {path}")
    print(f"  encoder: hidden={cfg.hidden_size} layers={cfg.num_layers} "
          f"heads={cfg.num_heads} params={n_params / 1e6:.1f}M")
    print(f"  use with: --encoder_init {args.out}")


if __name__ == "__main__":
    main()
