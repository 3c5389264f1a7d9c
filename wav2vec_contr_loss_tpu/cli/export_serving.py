"""Export the fused serving graph as a self-contained jax.export artifact.

The reference deploys as Python + torch + checkpoints + .npy plumbing
(extract_stage1_embeddings.py + generate_eval_score_file.py); this emits
ONE file — serialized StableHLO with the weights baked in — that any jax
process can `load_exported()` and call, with no model code, checkpoints,
or transformers dependency. Multi-platform (TPU + CPU) by default.

    python -m wav2vec_contr_loss_tpu.cli.export_serving \
        --stage1_dir checkpoints_stage1/<tag> --stage2_dir scores_stage2/<tag> \
        --out spoof_scorer.jaxexport [--batch 8] [--quantize w8] [--wire int16]

    # consumer side (only jax needed):
    from wav2vec_contr_loss_tpu.eval.serving import load_exported
    logits = load_exported("spoof_scorer.jaxexport")(waves)  # (B,T)->(B,)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage1_dir", type=str, required=True)
    p.add_argument("--stage1_name", type=str, default="best")
    p.add_argument("--stage2_dir", type=str, required=True)
    p.add_argument("--stage2_name", type=str,
                   default="stage2_binary_head_best")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path (.jaxexport)")
    p.add_argument("--batch", type=int, default=8,
                   help="static serving batch baked into the artifact")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "w8a8", "w8"],
                   help="int8 encoder quantization (ops/quant.py): also "
                        "shrinks the baked weights ~4x")
    p.add_argument("--wire", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="input signature: int16 PCM halves input buffers")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated lowering targets")
    args = p.parse_args(argv)

    # fail fast, BEFORE the expensive checkpoint load: tolerate spaces
    # ('tpu, cpu') and trailing commas, reject unknown targets here rather
    # than deep inside jax.export
    platforms = tuple(t.strip() for t in args.platforms.split(",")
                      if t.strip())
    known = {"tpu", "cpu", "cuda", "rocm"}
    if not platforms or not set(platforms) <= known:
        p.error(f"--platforms must be a comma-separated subset of "
                f"{sorted(known)}, got {args.platforms!r}")

    from ..eval.serving import SpoofScorer

    scorer = SpoofScorer.from_checkpoints(
        args.stage1_dir, args.stage2_dir,
        stage1_name=args.stage1_name, stage2_name=args.stage2_name,
        quantize=args.quantize)
    blob = scorer.export(args.batch, wire=args.wire,
                         platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"[export_serving] wrote {args.out}: {len(blob) / 1e6:.1f} MB "
          f"(batch={args.batch}, quantize={args.quantize}, "
          f"wire={args.wire}, platforms={args.platforms})", file=sys.stderr)


if __name__ == "__main__":
    main()
