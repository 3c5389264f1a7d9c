#!/bin/bash
# One-shot runbook for the measurements blocked on the axon TPU service
# (tracked in docs/SERVING.md and the ARCHITECTURE round-3 log). Run it
# when `python -c "import jax; jax.devices()"` shows the TPU again:
#
#     bash tools/run_pending_tpu.sh [logfile]
#
# Steps run SERIALLY (concurrent heavy jobs starve each other — CLAUDE.md)
# and each prints one JSON line; append the numbers to:
#   - docs/SERVING.md int8 table      (serving w8a8/w8 rows)
#   - docs/ARCHITECTURE.md / TRAINING (grad_dtype adjudication)
# First compiles of NEW programs on the remote-compile service can take
# 10-45 min each; cached reruns ~4 min.
set -u
LOG=${1:-/tmp/pending_tpu_results.log}
run() {
  echo "=== $(date -u '+%H:%M:%S') $*" | tee -a "$LOG"
  timeout 5400 "$@" 2>&1 | tail -3 | tee -a "$LOG"
}

# 1. confirm the headline number still reproduces (cached: ~4 min)
run python bench.py

# 2. grad_dtype=bfloat16 (knob committed unmeasured; adopt as default
#    only if it gains — compare against step 1)
run python bench.py --grad_dtype bfloat16

# 3. int8 quantized serving latency rows, B=8 then B=32-shaped extract
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which serving --serving_quant w8a8 --serving_batch 8
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which serving --serving_quant w8 --serving_batch 8
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which extract --serving_quant w8a8 --extract_batch 32
run python -m wav2vec_contr_loss_tpu.cli.bench_components \
    --which extract --serving_quant w8 --extract_batch 32

echo "=== done $(date -u '+%H:%M:%S') — results in $LOG" | tee -a "$LOG"
