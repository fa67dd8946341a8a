#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep3}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_tpu_compile
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
  "${@:2}" > "$LOG/$1.log" 2>&1
  echo "rc=$?" | tee -a "$LOG/summary.txt"
  grep -v WARNING "$LOG/$1.log" | grep -E "metric|Error|RESOURCE|EXHAUST|500" | tail -3 >> "$LOG/summary.txt"
}
run v1_qa_af    python bench.py metric=train remat=qkv_attn opt=adafactor
run v1_qa_adamw python bench.py metric=train remat=qkv_attn
run v1_q_adamw  python bench.py metric=train remat=qkv
run v1_qa_af_bf16sm python bench.py metric=train remat=qkv_attn opt=adafactor softmax=bf16
echo "SWEEP3 DONE" | tee -a "$LOG/summary.txt"
