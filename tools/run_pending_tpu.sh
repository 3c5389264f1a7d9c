#!/bin/bash
# One-shot runbook for measurements pending on the axon TPU service
# (tracked in docs/SERVING.md and the ARCHITECTURE round-3 log). Run it
# when `python -c "import jax; jax.devices()"` shows the TPU again:
#
#     bash tools/run_pending_tpu.sh [logfile]
#
# Steps run SERIALLY (concurrent heavy jobs starve each other — CLAUDE.md)
# and each prints one JSON line. Completed 2026-08-18: headline bench
# (150.8), grad_dtype bf16 (155.3, adopted), int8 serving B=8 rows and
# int8 extract B=32 rows (docs/SERVING.md — w8a8 405.6 resident).
# Remaining: the layer_mean_dtype re-adjudication at the 155.3 base
# (measured neutral at the r2 131.9 base; the carry band's relative
# share grew as other bands shrank).
set -u
LOG=${1:-/tmp/pending_tpu_results.log}
run() {
  echo "=== $(date -u '+%H:%M:%S') $*" | tee -a "$LOG"
  timeout 5400 "$@" 2>&1 | tail -3 | tee -a "$LOG"
}

run python bench.py --layer_mean_dtype bfloat16

echo "=== done $(date -u '+%H:%M:%S') — results in $LOG" | tee -a "$LOG"
