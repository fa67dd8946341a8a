#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep5}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_tpu_compile
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
  "${@:2}" > "$LOG/$1.log" 2>&1
  echo "rc=$?" | tee -a "$LOG/summary.txt"
  grep -v WARNING "$LOG/$1.log" | grep -E "metric|Error|RESOURCE|EXHAUST|HTTP 500" | tail -2 >> "$LOG/summary.txt"
}
run v2_b3_bf16   python bench.py metric=train_v2 remat=qkv_fc1_attn batch=3 softmax=bf16 iters=6
run v2_b2_bf16_i10 python bench.py metric=train_v2 remat=qkv_fc1_attn batch=2 softmax=bf16 iters=10
run v2_b2_qa_bf16 python bench.py metric=train_v2 remat=qkv_attn batch=2 softmax=bf16 iters=6
echo "SWEEP5 DONE" | tee -a "$LOG/summary.txt"
