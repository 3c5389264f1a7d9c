#!/bin/bash
# One-shot runbook for measurements pending on the axon TPU service
# (tracked in docs/SERVING.md and the ARCHITECTURE round logs). Run it
# when `python -c "import jax; jax.devices()"` shows the TPU again:
#
#     bash tools/run_pending_tpu.sh [logfile]
#
# Steps run SERIALLY (concurrent heavy jobs starve each other — CLAUDE.md)
# and each prints one JSON line (or a profile summary).
#
# ROUND-4 QUEUE (VERDICT r3 asks #3/#4 — bench table + tail bounds):
#   1. headline re-measurement (cached program, ~4 min)
#   2. --mode stage2      stage-2 scoring batches/s   (tiny compile)
#   3. --mode extract     frozen extraction clips/s   (new compile)
#   4. --mode baseline    BCE trainer clips/s         (new compile)
#   5. --dropout0         PRNG+mask tail bound        (new compile)
#   6. profile_step --buckets  tail decomposition     (cached + capture)
# First compiles of NEW programs on the axon remote-compile service take
# 10-45 min each; cached reruns ~4 min. Budget ~2-3 h for the queue.
set -u
LOG=${1:-/tmp/pending_tpu_results.log}
run() {
  echo "=== $(date -u '+%H:%M:%S') $*" | tee -a "$LOG"
  timeout 5400 "$@" 2>&1 | tail -3 | tee -a "$LOG"
}

run python bench.py
run python bench.py --mode stage2
run python bench.py --mode extract
run python bench.py --mode baseline
run python bench.py --dropout0
echo "=== $(date -u '+%H:%M:%S') profile_step --buckets" | tee -a "$LOG"
timeout 5400 python tools/profile_step.py --buckets 2>&1 | tee -a "$LOG.profile" | tail -30 | tee -a "$LOG"

echo "=== done $(date -u '+%H:%M:%S') — results in $LOG" | tee -a "$LOG"
