#!/bin/bash
# One-shot runbook for measurements pending on the axon TPU service
# (tracked in docs/SERVING.md and the ARCHITECTURE round-3 log). Run it
# when `python -c "import jax; jax.devices()"` shows the TPU again:
#
#     bash tools/run_pending_tpu.sh [logfile]
#
# Steps run SERIALLY (concurrent heavy jobs starve each other — CLAUDE.md)
# and each prints one JSON line.
#
# All round-3 pending measurements are COMPLETE as of 2026-08-19:
#   - headline bench (150.8), grad_dtype bf16 (155.3, adopted)
#   - int8 serving B=8 rows and int8 extract B=32 rows
#     (docs/SERVING.md — w8a8 405.6 clips/s resident)
#   - layer_mean_dtype re-adjudication at the 155.3 base: 155.1,
#     still neutral, fp32 kept (commit c44ebaa; docs/TRAINING.md table)
#
# The default step below is a plain headline re-measurement — use this
# file as the template when new measurements queue up behind a service
# outage.
set -u
LOG=${1:-/tmp/pending_tpu_results.log}
run() {
  echo "=== $(date -u '+%H:%M:%S') $*" | tee -a "$LOG"
  timeout 5400 "$@" 2>&1 | tail -3 | tee -a "$LOG"
}

run python bench.py

echo "=== done $(date -u '+%H:%M:%S') — results in $LOG" | tee -a "$LOG"
