"""Baseline scorer CLI: end-to-end BCE model scores ASV-eval / ITW straight
from audio; utt ids are the real audio file names
(reference: eval_baseline_score_file.py)."""

from __future__ import annotations

import argparse
import os

from ..data import BatchPipeline
from ..eval.score import write_cm_scores
from ..train import BaselineTrainer
from .common import add_asv_paths, asv_dataset, itw_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_asv_paths(p, dev=False, eval_=True, itw=True)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--ckpt_name", type=str, default="baseline_best")
    p.add_argument("--scores_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    trainer, state = BaselineTrainer.from_checkpoint(args.ckpt_dir, args.ckpt_name)
    seconds = trainer.cfg.max_duration_seconds

    targets = []
    if args.eval_protocol:
        targets.append(("score_cm_eval.txt",
                        asv_dataset(args.eval_root, args.eval_protocol,
                                    seconds=seconds)))
    if args.itw_protocol:
        targets.append(("score_cm_itw.txt",
                        itw_dataset(args.itw_root, args.itw_protocol,
                                    seconds=seconds)))
    for fname, ds in targets:
        out_path = os.path.join(args.scores_dir, fname)
        if os.path.exists(out_path) and not args.overwrite:
            print(f"[SKIP] existing score file: {out_path}")
            continue
        pipe = BatchPipeline(ds, args.batch_size, num_workers=args.num_workers)
        logits, labels = trainer.score_dataset(state, pipe)
        utt_ids = [u.name for u in ds.utterances]
        write_cm_scores(out_path, labels, logits, utt_ids=utt_ids)
        print(f"Done writing scores: {out_path}")


if __name__ == "__main__":
    main()
