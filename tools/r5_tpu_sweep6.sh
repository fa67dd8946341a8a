#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep6}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_tpu_compile
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
  "${@:2}" > "$LOG/$1.log" 2>&1
  echo "rc=$?" | tee -a "$LOG/summary.txt"
  grep -v WARNING "$LOG/$1.log" | grep -E "metric|Error|RESOURCE|HTTP 500" | tail -2 >> "$LOG/summary.txt"
}
run t2iv2_pc     python bench.py metric=t2i_v2 prefix_cache=1
run t2iv2_plain  python bench.py metric=t2i_v2
run serve_sampled     python bench.py metric=serve int8=1 temperature=0.9 top_p=0.9 top_k=none
run serve_spec2_sampled python bench.py metric=serve spec=2 int8=1 temperature=0.9 top_p=0.9 top_k=none
echo "SWEEP6 DONE" | tee -a "$LOG/summary.txt"
