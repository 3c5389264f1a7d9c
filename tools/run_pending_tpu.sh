#!/bin/bash
# One-shot runbook for measurements pending on the axon TPU service
# (tracked in docs/SERVING.md and the ARCHITECTURE round-3 log). Run it
# when `python -c "import jax; jax.devices()"` shows the TPU again:
#
#     bash tools/run_pending_tpu.sh [logfile]
#
# Steps run SERIALLY (concurrent heavy jobs starve each other — CLAUDE.md)
# and each prints one JSON line. Completed 2026-08-18: headline bench
# (150.8), grad_dtype bf16 (155.3, adopted), int8 serving B=8 rows
# (docs/SERVING.md). Remaining: the int8 EXTRACT rows below (new
# programs — first compiles on the remote-compile service can take
# 10-45 min each; cached reruns ~4 min).
set -u
LOG=${1:-/tmp/pending_tpu_results.log}
run() {
  echo "=== $(date -u '+%H:%M:%S') $*" | tee -a "$LOG"
  timeout 5400 "$@" 2>&1 | tail -3 | tee -a "$LOG"
}

# int8 quantized extraction throughput, B=32 production shape
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which extract --serving_quant w8a8 --extract_batch 32
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which extract --serving_quant w8 --extract_batch 32

echo "=== done $(date -u '+%H:%M:%S') — results in $LOG" | tee -a "$LOG"
