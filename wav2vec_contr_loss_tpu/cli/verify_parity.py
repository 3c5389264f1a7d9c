"""Score-parity verification harness.

Runs a published experiment preset end-to-end on real ASVspoof2019-LA (+
optional In-The-Wild) data and checks the resulting EERs against the
reference's committed results (BASELINE.md) within a tolerance — the
north-star acceptance criterion (EER within 0.2% absolute on ASV19 LA
eval). Exits non-zero on failure so it can gate CI.

Needs the real corpora and a pretrained encoder; in air-gapped/test
environments use the synthetic-corpus e2e tests instead (tests/test_cli.py).
"""

from __future__ import annotations

import argparse
import os
import sys

from ..eval.metrics import calculate_eer_from_file

# reference EERs in % recomputed from the committed score files (BASELINE.md)
REFERENCE_EER = {
    "supcon": (0.299, 13.694),
    "supcon_temp_0.05": (0.370, 18.270),
    "supcon_temp_0.07": (0.326, 12.102),
    "supcon_temp_0.07_batch_64": (2.884, 40.548),
    "supcon_temp_0.1": (0.299, 15.885),
    "supcon_temp_0.6": (1.213, 9.097),
    "supcon_geodesic": (0.297, 14.853),
    "supcon_geodesic_temp_0.05": (0.204, 9.623),
    "supcon_geodesic_temp_0.07": (0.191, 12.671),
    "supcon_geodesic_temp_0.1": (0.370, 10.299),
    "supcon_geodesic_temp_0.6": (0.528, 10.478),
    "supcon_uniformity": (1.444, 15.139),
    "supcon_uniformity_weight_0.01": (0.392, 11.627),
    "supcon_uniformity_weight_0.05": (0.218, 13.481),
    "supcon_uniformity_weight_0.1": (0.231, 18.509),
    "supcon_uniformity_weight_0.6": (0.938, 18.053),
}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_name", type=str, required=True,
                   choices=sorted(REFERENCE_EER))
    p.add_argument("--scores_dir", type=str, default=None,
                   help="existing score-file dir; otherwise run the full "
                        "pipeline first (pass the run_pipeline data flags)")
    p.add_argument("--tolerance", type=float, default=0.2,
                   help="max |EER - reference| in absolute percent (ASV19)")
    p.add_argument("--itw_tolerance", type=float, default=2.0,
                   help="looser ITW tolerance (domain-shift variance)")
    args, passthrough = p.parse_known_args(argv)

    if args.scores_dir is None:
        from . import run_pipeline

        run_pipeline.main(["--exp_name", args.exp_name] + passthrough)
        # run_pipeline's layout
        work = "experiments"
        for i, a in enumerate(passthrough):
            if a == "--work_dir":
                work = passthrough[i + 1]
        model = "facebook/wav2vec2-xls-r-300m"
        for i, a in enumerate(passthrough):
            if a == "--model_name":
                model = passthrough[i + 1]
        args.scores_dir = os.path.join(
            work, args.exp_name, "scores", args.exp_name,
            model.replace("/", "__"),
        )

    ref_eval, ref_itw = REFERENCE_EER[args.exp_name]
    ok = True
    eval_path = os.path.join(args.scores_dir, "score_cm_eval.txt")
    if os.path.exists(eval_path):
        eer = calculate_eer_from_file(eval_path)
        passed = abs(eer - ref_eval) <= args.tolerance
        ok &= passed
        print(f"ASV19 LA eval: EER={eer:.3f}% ref={ref_eval:.3f}% "
              f"tol={args.tolerance} -> {'PASS' if passed else 'FAIL'}")
    else:
        ok = False
        print(f"FAIL: missing {eval_path}")

    itw_path = os.path.join(args.scores_dir, "score_cm_itw.txt")
    if os.path.exists(itw_path):
        eer = calculate_eer_from_file(itw_path)
        passed = abs(eer - ref_itw) <= args.itw_tolerance
        ok &= passed
        print(f"In-The-Wild:   EER={eer:.3f}% ref={ref_itw:.3f}% "
              f"tol={args.itw_tolerance} -> {'PASS' if passed else 'FAIL'}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
