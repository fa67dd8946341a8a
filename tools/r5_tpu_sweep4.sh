#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep4}
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
# v1: heavier save rung with adafactor; + bf16 softmax
run v1_qfa_af       python bench.py metric=train remat=qkv_fc1_attn opt=adafactor
run v1_qfa_af_bf16  python bench.py metric=train remat=qkv_fc1_attn opt=adafactor softmax=bf16
# v2: bf16 softmax + pallas_trainable at the best config
run v2_b2_bf16      python bench.py metric=train_v2 remat=qkv_fc1_attn batch=2 softmax=bf16 iters=5
run v2_b2_pallas    python bench.py metric=train_v2 remat=qkv_fc1_attn batch=2 attn_impl=pallas_trainable iters=5
echo "SWEEP4 DONE" | tee -a "$LOG/summary.txt"
