"""Score-file generation CLI: stage-2 head over saved embeddings -> ASVspoof
CM score files with synthetic utt ids, skip-if-exists
(reference: generate_eval_score_file.py)."""

from __future__ import annotations

import argparse
import os
import sys

from ..config import Stage2Config
from ..eval.extract import load_embeddings
from ..eval.score import write_cm_scores
from ..train import stage2_scores
from ..train.checkpoint import load_sidecar, restore_checkpoint


def load_stage2_head(ckpt_dir: str, name: str = "stage2_binary_head_best"):
    """-> (Stage2Config, head params) from a stage-2 checkpoint
    (reference: generate_eval_score_file.py:97-124)."""
    sidecar = load_sidecar(ckpt_dir, name)
    c = sidecar["config"]
    cfg = Stage2Config(
        head_type=c.get("HEAD_TYPE", "linear"),
        in_dim=int(c.get("IN_DIM", 256)),
        hidden_dim=int(c.get("HIDDEN_DIM", 128)),
        dropout=float(c.get("DROPOUT", 0.2)),
    )
    params, _ = restore_checkpoint(ckpt_dir, name)
    # stderr: stdout may be a machine-readable stream (cli.serve)
    print(f"Loaded Stage-2 head: type={cfg.head_type}, in_dim={cfg.in_dim}, "
          f"hidden_dim={cfg.hidden_dim}, dropout={cfg.dropout}",
          file=sys.stderr)
    return cfg, params


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--emb_dir", type=str, required=True)
    p.add_argument("--stage2_dir", type=str, required=True)
    p.add_argument("--stage2_name", type=str, default="stage2_binary_head_best")
    p.add_argument("--scores_dir", type=str, required=True)
    p.add_argument("--splits", type=str, nargs="+", default=["eval", "itw"],
                   help="embedding splits to score")
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    cfg, params = load_stage2_head(args.stage2_dir, args.stage2_name)
    # score-file naming + utt prefixes per the reference
    # (generate_eval_score_file.py:159-166)
    name_map = {"eval": ("score_cm_eval.txt", "asv_eval"),
                "itw": ("score_cm_itw.txt", "itw")}
    for split in args.splits:
        fname, prefix = name_map.get(split, (f"score_cm_{split}.txt", split))
        out_path = os.path.join(args.scores_dir, fname)
        if os.path.exists(out_path) and not args.overwrite:
            print(f"[SKIP] existing score file: {out_path}")
            continue
        embs, labels = load_embeddings(args.emb_dir, split)
        logits = stage2_scores(cfg, params, embs)
        write_cm_scores(out_path, labels, logits, utt_prefix=prefix)
        print(f"Done writing scores: {out_path}")


if __name__ == "__main__":
    main()
