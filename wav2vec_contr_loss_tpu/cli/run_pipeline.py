"""Full experiment pipeline driver — the reference's train_stage1.sbatch as
one in-process command (reference: train_stage1.sbatch:40-120; SURVEY.md
§3.3). State flows through the filesystem exactly like the reference:
checkpoints -> .npy embeddings -> score .txt -> EER.

  1. stage-1 SupCon training (preset or flags)
  2. UMAP/PCA plots of the eval/ITW embeddings
  3. embedding extraction for ASV train/dev/eval + ITW
  4. stage-2 classifier training
  5. score-file generation
  6. EER report
"""

from __future__ import annotations

import argparse
import os

from ..config import EXPERIMENT_PRESETS
from . import (
    eval_scores,
    extract_embeddings,
    generate_scores,
    plot_umap,
    train_stage1,
    train_stage2,
)
from .common import save_dir_for


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_name", type=str, required=True,
                   choices=sorted(EXPERIMENT_PRESETS))
    p.add_argument("--model_name", type=str,
                   default="facebook/wav2vec2-xls-r-300m")
    p.add_argument("--encoder_init", type=str, default="pretrained",
                   choices=["pretrained", "random"])
    p.add_argument("--work_dir", type=str, default="experiments")
    p.add_argument("--train_root", type=str, default="")
    p.add_argument("--train_protocol", type=str, default="")
    p.add_argument("--dev_root", type=str, default="")
    p.add_argument("--dev_protocol", type=str, default="")
    p.add_argument("--eval_root", type=str, default="")
    p.add_argument("--eval_protocol", type=str, default="")
    p.add_argument("--itw_root", type=str, default="")
    p.add_argument("--itw_protocol", type=str, default="")
    p.add_argument("--num_samples", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_duration_seconds", type=int, default=None)
    p.add_argument("--input_dim", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    # stage-2 overrides (the reference's sbatch can vary the classifier
    # flags independently of stage-1 — train_stage1.sbatch:105-108)
    p.add_argument("--stage2_lr", type=float, default=None)
    p.add_argument("--stage2_epochs", type=int, default=None)
    p.add_argument("--stage2_patience", type=int, default=None)
    p.add_argument("--stage2_head_type", type=str, default=None,
                   choices=["linear", "mlp"])
    p.add_argument("--stage1_ckpt", type=str, default=None,
                   help="use an EXISTING stage-1 checkpoint directory "
                        "(e.g. written by convert_reference_checkpoint "
                        "from a reference-trained .pt) and skip the "
                        "training leg — extraction/stage-2/scoring/EER "
                        "still run")
    p.add_argument("--skip_plots", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume stage-1 from its latest checkpoint (incl. "
                        "mid-epoch preemption saves); later stages are "
                        "already idempotent (skip-if-exists)")
    p.add_argument("--cache_waveforms", type=str, default=None,
                   help="decode-once waveform cache dir for the stage-1 "
                        "training leg (data/cache.py)")
    from ..utils.distributed import add_multihost_arg, init_from_args

    add_multihost_arg(p)
    args = p.parse_args(argv)

    if args.stage1_ckpt:
        # fail loudly instead of silently dropping training-leg flags
        ignored = [f"--{f}" for f in
                   ("epochs", "batch_size", "max_duration_seconds",
                    "input_dim", "hidden_dim", "cache_waveforms")
                   if getattr(args, f) is not None]
        if args.resume:
            ignored.append("--resume")
        if args.encoder_init != "pretrained":
            ignored.append("--encoder_init")
        if ignored:
            p.error(f"{' '.join(ignored)} configure the stage-1 TRAINING "
                    "leg, which --stage1_ckpt skips — drop them (the "
                    "checkpoint carries its own config)")

    init_from_args(args)

    exp_dir = os.path.join(args.work_dir, args.exp_name)
    ckpt_base = os.path.join(exp_dir, "checkpoints_stage1")
    ckpt_dir = save_dir_for(ckpt_base, args.model_name)
    emb_dir = os.path.join(exp_dir, "embeddings")
    stage2_dir = os.path.join(exp_dir, "checkpoints_stage2")
    scores_dir = save_dir_for(os.path.join(exp_dir, "scores", args.exp_name),
                              args.model_name)

    def paths(*names):
        out = []
        for n in names:
            out += [f"--{n}", getattr(args, n)]
        return out

    # 1) stage-1 (skipped when an existing checkpoint is supplied, e.g.
    # one converted from a reference-trained .pt)
    if args.stage1_ckpt:
        ckpt_dir = args.stage1_ckpt
    else:
        s1 = ["--preset", args.exp_name, "--model_name", args.model_name,
              "--encoder_init", args.encoder_init, "--save_dir", ckpt_base]
        s1 += paths("train_root", "train_protocol", "dev_root",
                    "dev_protocol")
        if args.num_samples is not None:
            s1 += ["--num_samples", args.num_samples]
        for flag in ("epochs", "batch_size", "max_duration_seconds",
                     "input_dim", "hidden_dim"):
            v = getattr(args, flag)
            if v is not None:
                s1 += [f"--{flag}", str(v)]
        if args.resume:
            s1 += ["--resume"]
        if args.cache_waveforms:
            s1 += ["--cache_waveforms", args.cache_waveforms]
        train_stage1.main(s1)

    # 2) extraction (train/dev/eval/itw as provided). --num_samples is
    # forwarded so a smoke run subsets EVERY leg, not just training —
    # otherwise extraction would embed the full corpora (review r3 finding)
    ex = ["--ckpt_dir", ckpt_dir, "--out_dir", emb_dir]
    if args.num_samples is not None:
        ex += ["--num_samples", args.num_samples]
    ex += paths("train_root", "train_protocol", "dev_root", "dev_protocol")
    if args.eval_protocol:
        ex += paths("eval_root", "eval_protocol")
    if args.itw_protocol:
        ex += paths("itw_root", "itw_protocol")
    extract_embeddings.main(ex)

    # 3) plots
    if not args.skip_plots:
        for split in ("eval", "itw"):
            if os.path.exists(os.path.join(emb_dir, f"{split}_embeddings.npy")):
                plot_umap.main(["--emb_dir", emb_dir, "--split", split,
                                "--out_dir", os.path.join(exp_dir, "plots")])

    # 4) stage-2
    s2 = ["--emb_dir", emb_dir, "--save_dir", stage2_dir]
    for flag, name in (("lr", "stage2_lr"), ("epochs", "stage2_epochs"),
                       ("patience", "stage2_patience"),
                       ("head_type", "stage2_head_type")):
        v = getattr(args, name)
        if v is not None:
            s2 += [f"--{flag}", str(v)]
    train_stage2.main(s2)

    # 5) scores
    splits = [s for s in ("eval", "itw")
              if os.path.exists(os.path.join(emb_dir, f"{s}_embeddings.npy"))]
    if splits:
        generate_scores.main(["--emb_dir", emb_dir, "--stage2_dir", stage2_dir,
                              "--scores_dir", scores_dir, "--splits"] + splits)
        # 6) EER report
        eval_scores.main([os.path.join(scores_dir, f"score_cm_{s}.txt")
                          for s in splits])


if __name__ == "__main__":
    main()
