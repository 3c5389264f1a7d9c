"""Stage-1 embedding extraction CLI: frozen backbone -> (N, D) .npy per
split for ASV train/dev/eval and In-The-Wild
(reference: extract_stage1_embeddings.py)."""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..data import BatchPipeline
from ..eval.extract import extract_embeddings
from ..train import Stage1Trainer
from .common import add_asv_paths, asv_dataset, itw_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_asv_paths(p, dev=True, eval_=True, itw=True)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--ckpt_name", type=str, default="best")
    p.add_argument("--out_dir", type=str, default="embeddings/run")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--num_samples", type=str, default=None,
                   help="seeded per-split subsample ('None' literal = all; "
                        "reference convention, stage1_config.py:179-183) — "
                        "run_pipeline forwards its smoke-run subsetting "
                        "here so extraction matches the training subset")
    args = p.parse_args(argv)

    num_samples = None
    if args.num_samples is not None:
        ns = args.num_samples.strip().lower()
        num_samples = None if ns in ("none", "null") else int(ns)

    trainer, state = Stage1Trainer.from_checkpoint(args.ckpt_dir, args.ckpt_name)
    seconds = trainer.cfg.max_duration_seconds

    def embed_fn(waves):
        return trainer.embed_step(state.params, state.frozen,
                                  {"waveforms": jnp.asarray(waves)})

    splits = []
    if args.train_protocol:
        splits.append(("train", asv_dataset(args.train_root, args.train_protocol,
                                            num_samples, seconds=seconds)))
    if args.dev_protocol:
        splits.append(("dev", asv_dataset(args.dev_root, args.dev_protocol,
                                          num_samples, seconds=seconds)))
    if args.eval_protocol:
        splits.append(("eval", asv_dataset(args.eval_root, args.eval_protocol,
                                           num_samples, seconds=seconds)))
    if args.itw_protocol:
        splits.append(("itw", itw_dataset(args.itw_root, args.itw_protocol,
                                          num_samples, seconds=seconds)))
    for name, ds in splits:
        pipe = BatchPipeline(ds, args.batch_size, num_workers=args.num_workers)
        extract_embeddings(embed_fn, pipe, args.out_dir, name,
                           overwrite=args.overwrite)


if __name__ == "__main__":
    main()
