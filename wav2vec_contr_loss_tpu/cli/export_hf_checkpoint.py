"""Export a trained encoder back to a HuggingFace checkpoint directory.

The inverse of `convert_hf_checkpoint`: a stage-1/baseline-trained (or
converted) encoder becomes a snapshot that
`transformers.Wav2Vec2Model.from_pretrained(out)` loads directly — no
lock-in: users can take a TPU-finetuned encoder back to the torch
ecosystem the reference lives in (reference: encoder.py:21).

`--src` accepts:
  * a stage-1 checkpoint directory (with `--name best|latest`),
  * a baseline checkpoint directory (`--name baseline_best`),
  * an encoder-init directory written by convert_hf_checkpoint.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=str, required=True,
                   help="checkpoint directory (stage-1 / baseline / "
                        "encoder-init)")
    p.add_argument("--name", type=str, default="best",
                   help="checkpoint name inside --src (best, latest, "
                        "baseline_best, ... — ignored for encoder-init "
                        "dirs)")
    p.add_argument("--out", type=str, required=True,
                   help="output HF snapshot directory")
    args = p.parse_args(argv)

    from ..models.export_hf import save_hf_checkpoint
    from ..train import checkpoint as ckpt

    enc_cfg = enc_params = None
    if ckpt.checkpoint_exists(args.src, "encoder"):
        from ..models.hf_convert import load_encoder_init

        enc_cfg, enc_params = load_encoder_init(args.src)
    else:
        sidecar = ckpt.load_sidecar(args.src, args.name)
        extra = sidecar.get("extra", {})
        if "stage1_config" in extra:
            from ..train.stage1 import Stage1Trainer as Trainer
        elif "baseline_config" in extra:
            from ..train.baseline import BaselineTrainer as Trainer
        else:
            raise SystemExit(f"unrecognized checkpoint at {args.src}/"
                             f"{args.name}: no stage1/baseline/encoder-init "
                             f"sidecar")
        trainer, state = Trainer.from_checkpoint(args.src, args.name)
        enc_cfg = trainer.enc_config
        enc_params = (state.params.get("encoder")
                      or state.frozen.get("encoder"))
    if enc_params is None:
        raise SystemExit("checkpoint holds no encoder params")
    out = save_hf_checkpoint(args.out, enc_cfg, enc_params)
    print(f"==> HF checkpoint written to {out} "
          f"(load with transformers.Wav2Vec2Model.from_pretrained)")


if __name__ == "__main__":
    main()
