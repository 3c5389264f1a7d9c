"""Prebuild a decode-once waveform cache (data/cache.py) for a protocol.

Useful before a multi-host launch (build once, share the directory) or
to front-load the decode cost of a 153k-clip corpus off the training
timeline. The train CLIs consume it via `--cache_waveforms DIR`; this
command builds the same layout (`<dir>/train` and `<dir>/dev`
subdirectories hold independent caches, one per protocol).
"""

from __future__ import annotations

import argparse
import os

from .common import add_asv_paths, asv_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_asv_paths(p)
    p.add_argument("--cache_waveforms", type=str, required=True,
                   help="cache root directory (train/dev subdirs)")
    p.add_argument("--cache_dtype", type=str, default="int16",
                   choices=["int16", "float32"])
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--max_duration_seconds", type=int, default=5)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args(argv)

    from ..data.cache import attach_cache

    train_ds = asv_dataset(args.train_root, args.train_protocol,
                           args.num_samples,
                           seconds=args.max_duration_seconds)
    attach_cache(train_ds, os.path.join(args.cache_waveforms, "train"),
                 dtype=args.cache_dtype, num_workers=args.num_workers)
    if args.dev_protocol:
        dev_ds = asv_dataset(args.dev_root, args.dev_protocol,
                             args.num_samples,
                             seconds=args.max_duration_seconds)
        attach_cache(dev_ds, os.path.join(args.cache_waveforms, "dev"),
                     dtype=args.cache_dtype, num_workers=args.num_workers)
    print(f"==> waveform cache ready in {args.cache_waveforms}")


if __name__ == "__main__":
    main()
