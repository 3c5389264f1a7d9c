"""Run the full published experiment sweep (all 16 presets) sequentially —
the multi-sbatch equivalent of the reference's scores/ directory tree
(BASELINE.md) in one command. Each experiment is resumable/idempotent via
run_pipeline's skip-if-exists stages.
"""

from __future__ import annotations

import argparse
import traceback

from ..config import EXPERIMENT_PRESETS
from . import run_pipeline


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiments", type=str, nargs="*", default=None,
                   help="subset of presets (default: all 16)")
    p.add_argument("--keep_going", action="store_true",
                   help="continue the sweep when one experiment fails")
    # pass-through flags for run_pipeline
    for flag in ("model_name", "encoder_init", "work_dir", "train_root",
                 "train_protocol", "dev_root", "dev_protocol", "eval_root",
                 "eval_protocol", "itw_root", "itw_protocol", "num_samples"):
        p.add_argument(f"--{flag}", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    args = p.parse_args(argv)

    names = args.experiments or sorted(EXPERIMENT_PRESETS)
    unknown = set(names) - set(EXPERIMENT_PRESETS)
    if unknown:
        raise SystemExit(f"unknown presets: {sorted(unknown)}")

    passthrough = []
    for flag in ("model_name", "encoder_init", "work_dir", "train_root",
                 "train_protocol", "dev_root", "dev_protocol", "eval_root",
                 "eval_protocol", "itw_root", "itw_protocol", "num_samples"):
        v = getattr(args, flag)
        if v is not None:
            passthrough += [f"--{flag}", v]
    if args.epochs is not None:
        passthrough += ["--epochs", str(args.epochs)]

    failures = []
    for i, name in enumerate(names, 1):
        print(f"\n===== [{i}/{len(names)}] experiment: {name} =====")
        try:
            run_pipeline.main(["--exp_name", name] + passthrough)
        except Exception:
            traceback.print_exc()
            failures.append(name)
            if not args.keep_going:
                raise
    if failures:
        print(f"\n[SWEEP] failed experiments: {failures}")
    else:
        print(f"\n[SWEEP] all {len(names)} experiments complete")


if __name__ == "__main__":
    main()
