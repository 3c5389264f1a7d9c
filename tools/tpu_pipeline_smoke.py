"""Real-hardware smoke of the flagship one-command pipeline.

Runs `cli.run_pipeline` (the reference's train_stage1.sbatch as one
command — SURVEY.md §3.3) end-to-end on whatever backend the shell
provides — on this box that is the real TPU chip via the axon tunnel —
against a generated synthetic corpus (sine = bonafide, noise = spoof)
with the tiny random encoder. The CPU-mesh test suite already covers
this path functionally (tests/test_cli.py::test_run_pipeline_cli); this
tool is the evidence that the canonical-environment launch itself works
on real hardware: axon platform registration, remote compile service,
H2D/D2H over the tunnel, every pipeline leg's jit programs.

    python tools/tpu_pipeline_smoke.py [--work_dir D] [--epochs 2]

Prints per-leg wall times and ONE final JSON line:
    {"metric": "pipeline_smoke", "eer_eval": ..., "eer_itw": ...,
     "wall_s": ..., "platform": "...", "ok": true}

NOTE: first compile of each new program on the axon remote-compile
service can take 10-45 min (CLAUDE.md); run under a generous timeout
and never concurrently with another heavy job.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def build_corpus(root: str, n_clips: int, seed: int = 3) -> None:
    from wav2vec_contr_loss_tpu.data.audio import write_wav

    rng = np.random.default_rng(seed)
    asv_lines = []
    itw_lines = ["file,speaker,label"]
    for i in range(n_clips):
        name = f"clip_{i:04d}.wav"
        bona = i % 2 == 0
        if bona:
            f0 = 200 + 40 * (i % 5)
            x = 0.4 * np.sin(2 * np.pi * f0 * np.arange(SR) / SR)
        else:
            x = 0.2 * rng.standard_normal(SR)
        write_wav(os.path.join(root, name), x.astype(np.float32), SR)
        label = "bonafide" if bona else "spoof"
        attack = "-" if bona else f"A{(i % 3) + 1:02d}"
        asv_lines.append(f"x/{name} {attack} {label} - SPK{i % 4}")
        itw_lines.append(f"{name},SPK{i % 4},"
                         f"{'bona-fide' if bona else 'spoof'}")
    with open(os.path.join(root, "protocol.txt"), "w") as f:
        f.write("\n".join(asv_lines) + "\n")
    with open(os.path.join(root, "itw.csv"), "w") as f:
        f.write("\n".join(itw_lines) + "\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", default="/tmp/tpu_pipeline_smoke")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--keep", action="store_true",
                   help="keep work_dir (default: wiped first)")
    args = p.parse_args(argv)

    if not args.keep and os.path.isdir(args.work_dir):
        shutil.rmtree(args.work_dir)
    corpus = os.path.join(args.work_dir, "corpus")
    os.makedirs(corpus, exist_ok=True)
    build_corpus(corpus, args.clips)

    import jax

    platform = jax.devices()[0].platform
    print(f"[smoke] backend={platform} devices={len(jax.devices())}")

    from wav2vec_contr_loss_tpu.cli import run_pipeline

    proto = os.path.join(corpus, "protocol.txt")
    t0 = time.time()
    run_pipeline.main([
        "--exp_name", "supcon_temp_0.07",
        "--model_name", "test/tiny-wav2vec2",
        "--encoder_init", "random",
        "--work_dir", os.path.join(args.work_dir, "exp"),
        "--train_root", corpus, "--train_protocol", proto,
        "--dev_root", corpus, "--dev_protocol", proto,
        "--eval_root", corpus, "--eval_protocol", proto,
        "--itw_root", corpus,
        "--itw_protocol", os.path.join(corpus, "itw.csv"),
        "--epochs", str(args.epochs), "--batch_size", str(args.batch_size),
        "--max_duration_seconds", "1",
        "--input_dim", "32", "--hidden_dim", "16",
        # the tiny-corpus head needs a hotter stage-2 than the reference
        # defaults to orient within patience (same settings as the e2e
        # tests' Stage2Config)
        "--stage2_lr", "5e-2", "--stage2_epochs", "40",
    ])
    wall = time.time() - t0

    from wav2vec_contr_loss_tpu.eval.metrics import calculate_eer_from_file

    scores_dir = os.path.join(args.work_dir, "exp", "supcon_temp_0.07",
                              "scores", "supcon_temp_0.07",
                              "test__tiny-wav2vec2")
    eers = {}
    for split in ("eval", "itw"):
        f = os.path.join(scores_dir, f"score_cm_{split}.txt")
        if os.path.exists(f):
            eers[f"eer_{split}"] = round(calculate_eer_from_file(f), 3)
    # the corpus is linearly separable: a healthy pipeline drives eval
    # EER to ~0; 25% leaves slack for the 2-epoch recipe, while an
    # orientation bug (scores inverted vs keys) reads 100% and fails
    ok = bool(eers) and eers.get("eer_eval", 100.0) <= 25.0
    print(json.dumps({"metric": "pipeline_smoke", **eers,
                      "wall_s": round(wall, 1), "platform": platform,
                      "ok": ok}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
