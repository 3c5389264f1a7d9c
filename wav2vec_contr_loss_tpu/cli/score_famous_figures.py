"""FamousFigures scorer CLI: end-to-end stage1 backbone -> stage2 head over
a celebrity-deepfake protocol, with optional in-place EER
(reference: eval_famous_figures_score_file.py)."""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..data import AudioConfig, BatchPipeline, parse_famous_figures
from ..eval.metrics import compute_eer
from ..eval.score import write_cm_scores
from ..train import Stage1Trainer, stage2_scores
from .generate_scores import load_stage2_head


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--protocol", type=str, required=True)
    p.add_argument("--root_dir", type=str, default="")
    p.add_argument("--stage1_dir", type=str, required=True)
    p.add_argument("--stage1_name", type=str, default="best")
    p.add_argument("--stage2_dir", type=str, required=True)
    p.add_argument("--stage2_name", type=str, default="stage2_binary_head_best")
    p.add_argument("--scores_dir", type=str, required=True)
    p.add_argument("--subset", type=str, default="all",
                   choices=["all", "bonafide", "spoof"])
    p.add_argument("--include_speakers", type=str, nargs="*", default=None)
    p.add_argument("--include_sources", type=str, nargs="*", default=None)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--print_eer", action="store_true")
    args = p.parse_args(argv)

    trainer, state = Stage1Trainer.from_checkpoint(args.stage1_dir, args.stage1_name)
    cfg2, head_params = load_stage2_head(args.stage2_dir, args.stage2_name)

    ds = parse_famous_figures(
        args.protocol, args.root_dir,
        subset=args.subset,
        include_speakers=args.include_speakers,
        include_sources=args.include_sources,
        num_samples=args.num_samples,
        audio=AudioConfig(trainer.cfg.target_sample_rate,
                          trainer.cfg.max_duration_seconds),
    )
    pipe = BatchPipeline(ds, args.batch_size, num_workers=args.num_workers)

    zs, labels = [], []
    for b in pipe.sequential():
        z = np.asarray(trainer.embed_step(
            state.params, state.frozen,
            {"waveforms": jnp.asarray(b.waveforms)},
        ))
        zs.append(z[b.valid])
        labels.append(b.labels[b.valid])
    embs = np.concatenate(zs)
    labels = np.concatenate(labels)
    logits = stage2_scores(cfg2, head_params, embs)

    out_path = os.path.join(args.scores_dir, "score_cm_famous_figures.txt")
    utt_ids = [u.name for u in ds.utterances]
    write_cm_scores(out_path, labels, logits, utt_ids=utt_ids)
    print(f"Done writing scores: {out_path}")
    if args.print_eer:
        eer, _ = compute_eer(logits[labels == 1], logits[labels == 0])
        print(f"EER: {eer * 100:.2f}%")


if __name__ == "__main__":
    main()
