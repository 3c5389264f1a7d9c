"""EER / min-tDCF evaluation CLI over CM score files — replaces the
reference's notebook + empty eer_from_scores.py
(reference: eval_eer_score_file.ipynb, evaluation.py)."""

from __future__ import annotations

import argparse

import numpy as np

from ..eval.metrics import (
    ASVSPOOF2019_COST_MODEL,
    bootstrap_eer_ci,
    calculate_eer_from_file,
    compute_eer,
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


def _attack_breakdown(rec, protocol: str) -> list:
    """Per-attack EER rows for a score file whose lines are in protocol
    order (the contract of cli.generate_scores: utt ids are synthetic
    `<prefix>_%06d` in dataset order, which IS protocol line order —
    reference: generate_eval_score_file.py:149-166). Each spoof attack is
    scored against ALL bonafide trials, the standard ASVspoof per-attack
    pooling."""
    from ..data.protocols import parse_asvspoof2019

    ds = parse_asvspoof2019(protocol)
    if len(ds.utterances) != len(rec):
        raise SystemExit(
            f"--by_attack: protocol has {len(ds.utterances)} trials but the "
            f"score file has {len(rec)} lines — per-attack pairing is "
            "positional and needs the full, unsubsampled split")
    idx_to_attack = {v: k for k, v in ds.attack_to_idx.items()}
    multi = ds.multi_labels
    keys_match = (multi == 0) == (rec.keys == "bonafide")
    if not keys_match.all():
        bad = int(np.argmin(keys_match))
        raise SystemExit(
            f"--by_attack: bonafide/spoof keys disagree between protocol and "
            f"score file at line {bad} — wrong protocol for this score file?")
    bona = rec.bonafide_scores
    rows = []
    for a in sorted(idx_to_attack):
        if a == 0:
            continue
        scores_a = rec.scores[multi == a]
        eer = compute_eer(bona, scores_a)[0] * 100.0
        rows.append((idx_to_attack[a], int(scores_a.size), eer))
    return rows


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("score_files", nargs="+",
                   help="CM score files, or directories to scan recursively")
    p.add_argument("--tdcf", action="store_true",
                   help="also report min-tDCF (needs --pfa/--pmiss/--pmiss_spoof)")
    p.add_argument("--pfa_asv", type=float, default=0.01)
    p.add_argument("--pmiss_asv", type=float, default=0.01)
    p.add_argument("--pmiss_spoof_asv", type=float, default=0.9)
    p.add_argument("--bootstrap", type=int, default=0, metavar="N",
                   help="also report a seeded N-replicate bootstrap 95%% CI")
    p.add_argument("--seed", type=int, default=1337,
                   help="bootstrap resampling seed")
    p.add_argument("--by_attack", metavar="PROTOCOL", default=None,
                   help="ASVspoof2019 protocol file paired positionally with "
                        "the score lines: adds a per-attack EER table")
    args = p.parse_args(argv)

    for path in _expand_trees(args.score_files):
        eer = calculate_eer_from_file(path)
        line = f"{path}: EER = {eer:.3f}%"
        rec = None
        if args.tdcf or args.bootstrap or args.by_attack:
            rec = read_score_file(path)
        if args.bootstrap:
            lo, hi = bootstrap_eer_ci(rec.bonafide_scores, rec.spoof_scores,
                                      n_boot=args.bootstrap, seed=args.seed)
            line += f" | 95% CI [{lo * 100:.3f}, {hi * 100:.3f}]%"
        if args.tdcf:
            tdcf, _ = compute_tdcf(
                rec.bonafide_scores, rec.spoof_scores, args.pfa_asv,
                args.pmiss_asv, args.pmiss_spoof_asv, ASVSPOOF2019_COST_MODEL,
            )
            line += f" | min-tDCF = {float(tdcf.min()):.5f}"
        print(line)
        if args.by_attack:
            for attack, n, a_eer in _attack_breakdown(rec, args.by_attack):
                print(f"  {attack}: EER = {a_eer:.3f}%  (n={n})")


if __name__ == "__main__":
    main()
