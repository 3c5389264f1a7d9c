"""EER / min-tDCF evaluation CLI over CM score files — replaces the
reference's notebook + empty eer_from_scores.py
(reference: eval_eer_score_file.ipynb, evaluation.py)."""

from __future__ import annotations

import argparse

from ..eval.metrics import (
    ASVSPOOF2019_COST_MODEL,
    calculate_eer_from_file,
    compute_tdcf,
)
from ..eval.score import read_score_file


def _expand_trees(paths):
    """Directories expand to every score_cm_*.txt underneath (the whole
    scores/<exp>/<model>/ tree in one report, like the reference's
    eval_eer_score_file.ipynb table)."""
    import glob
    import os

    out = []
    for p in paths:
        if os.path.isdir(p):
            out += sorted(glob.glob(os.path.join(p, "**", "score_cm_*.txt"),
                                    recursive=True))
        else:
            out.append(p)
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("score_files", nargs="+",
                   help="CM score files, or directories to scan recursively")
    p.add_argument("--tdcf", action="store_true",
                   help="also report min-tDCF (needs --pfa/--pmiss/--pmiss_spoof)")
    p.add_argument("--pfa_asv", type=float, default=0.01)
    p.add_argument("--pmiss_asv", type=float, default=0.01)
    p.add_argument("--pmiss_spoof_asv", type=float, default=0.9)
    args = p.parse_args(argv)

    for path in _expand_trees(args.score_files):
        eer = calculate_eer_from_file(path)
        line = f"{path}: EER = {eer:.3f}%"
        if args.tdcf:
            rec = read_score_file(path)
            tdcf, _ = compute_tdcf(
                rec.bonafide_scores, rec.spoof_scores, args.pfa_asv,
                args.pmiss_asv, args.pmiss_spoof_asv, ASVSPOOF2019_COST_MODEL,
            )
            line += f" | min-tDCF = {float(tdcf.min()):.5f}"
        print(line)


if __name__ == "__main__":
    main()
