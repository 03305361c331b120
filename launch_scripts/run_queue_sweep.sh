#!/usr/bin/env bash
# Column/queue sweep on a single host — the analogue of the reference's
# queue-size sweep (slurm_scripts/submit_multi_queue_csd3.sh: queue sizes
# 1..10000 over config 32k[1]-n16k-1k). On TPU the queue is replaced by
# compiled column batching, so the sweep dimension is the configuration
# family + engine mode.
set -euo pipefail

CONFIGS="${CONFIGS:-4k[1]-n2k-512,8k[1]-n4k-512,16k[1]-n8k-512}"
OUT="${OUT:-sweep_results.jsonl}"

IFS=',' read -ra KEYS <<< "${CONFIGS}"
for key in "${KEYS[@]}"; do
  for mode in matmul fft; do
    echo "=== ${key} (${mode}) ===" >&2
    python bench.py --swift_config "${key}" --engine_mode "${mode}" \
      --skip_baseline | tee -a "${OUT}"
  done
done
