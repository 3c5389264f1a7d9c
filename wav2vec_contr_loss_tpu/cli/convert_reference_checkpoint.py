"""Reference-trained `.pt` checkpoint ingestion.

Converts the reference's trained torch artifacts — stage-1
`{compression_state_dict, config, [encoder_state_dict]}`
(reference: train_stage1.py:114-129), stage-2 heads
(reference: stage2_utils.py:186-207), and the baseline full model
(reference: baseline_train.py:392-417) — into the Orbax checkpoints this
framework's extractor / scorer / server restore natively. A reference
user with trained models switches over WITHOUT retraining:

    # finetuned stage-1 (.pt embeds the encoder):
    python -m wav2vec_contr_loss_tpu convert_reference_checkpoint \
        --src runs/..._stage1_head_best.pt --out ckpt/stage1
    python -m wav2vec_contr_loss_tpu extract_embeddings \
        --ckpt_dir ckpt/stage1 ...

    # frozen stage-1 (.pt has no encoder; supply the pretrained one):
    python -m wav2vec_contr_loss_tpu convert_reference_checkpoint \
        --src ..._stage1_head_best.pt --out ckpt/stage1 \
        --encoder_init ckpt/xlsr300m   # from convert_hf_checkpoint

    # stage-2 head / baseline:
    python -m wav2vec_contr_loss_tpu convert_reference_checkpoint \
        --src stage2_binary_head_best.pt --out ckpt/stage2
    python -m wav2vec_contr_loss_tpu convert_reference_checkpoint \
        --src ..._baseline_bce_best.pt --out ckpt/baseline
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=str, required=True,
                   help="reference .pt checkpoint (stage-1 / stage-2 head "
                        "/ baseline; format auto-detected)")
    p.add_argument("--out", type=str, required=True,
                   help="output checkpoint directory")
    p.add_argument("--kind", type=str, default="auto",
                   choices=["auto", "stage1", "stage2", "baseline"])
    p.add_argument("--encoder_init", type=str, default=None,
                   help="Orbax encoder dir from convert_hf_checkpoint — "
                        "supplies architecture AND pretrained weights "
                        "(REQUIRED for frozen stage-1 .pt files, which "
                        "embed no encoder state)")
    p.add_argument("--hf_config", type=str, default=None,
                   help="HF config.json supplying the encoder architecture "
                        "only (for .pt files that embed encoder weights)")
    p.add_argument("--name", type=str, default=None,
                   help="checkpoint name inside --out (defaults: best / "
                        "stage2_binary_head_best / baseline_best)")
    args = p.parse_args(argv)

    from ..models.ref_convert import convert_reference_checkpoint

    kind, path = convert_reference_checkpoint(
        args.src, args.out, kind=args.kind,
        encoder_init=args.encoder_init, hf_config=args.hf_config,
        name=args.name)
    print(f"Converted {args.src} ({kind}) -> {path}")
    follow = {
        "stage1": f"extract_embeddings --ckpt_dir {args.out}",
        "stage2": f"generate_scores --stage2_dir {args.out} ...",
        "baseline": f"score_baseline --ckpt_dir {args.out} ...",
    }[kind]
    print(f"  use with: python -m wav2vec_contr_loss_tpu {follow}")


if __name__ == "__main__":
    main()
