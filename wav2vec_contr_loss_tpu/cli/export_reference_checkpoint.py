"""Export trained checkpoints back to the reference's `.pt` formats.

Inverse of `convert_reference_checkpoint`: models trained HERE remain
consumable by the reference's own scripts — the stage-1 .pt reloads via
extract_stage1_embeddings.py:94-163, the stage-2 head via
generate_eval_score_file.py:97-124, the baseline via
eval_baseline_score_file.py:54-74. With `convert_reference_checkpoint`
this closes BOTH directions of the trained-model torch boundary (the
pretrained-encoder boundary is convert_hf_checkpoint /
export_hf_checkpoint).

    python -m wav2vec_contr_loss_tpu export_reference_checkpoint \
        --src checkpoints_stage1/supcon_temp_0.07 --out stage1_head_best.pt
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=str, required=True,
                   help="checkpoint directory written by our trainers "
                        "(stage-1 / stage-2 / baseline; auto-detected)")
    p.add_argument("--out", type=str, required=True,
                   help="output .pt path (reference format)")
    p.add_argument("--kind", type=str, default="auto",
                   choices=["auto", "stage1", "stage2", "baseline"])
    p.add_argument("--name", type=str, default=None,
                   help="checkpoint name inside --src (defaults: best / "
                        "stage2_binary_head_best / baseline_best; "
                        "requires --kind)")
    args = p.parse_args(argv)

    from ..models.ref_convert import export_reference_checkpoint

    kind, path = export_reference_checkpoint(
        args.src, args.out, kind=args.kind, name=args.name)
    print(f"Exported {args.src} ({kind}) -> {path}")
    loader = {
        "stage1": "extract_stage1_embeddings.py / "
                  "eval_famous_figures_score_file.py",
        "stage2": "generate_eval_score_file.py",
        "baseline": "eval_baseline_score_file.py",
    }[kind]
    print(f"  loads in the reference via: {loader}")


if __name__ == "__main__":
    main()
