#!/bin/bash
# Round-5 TPU sweep, part 2: v1 attention/ladder diagnosis + t2v routing.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep2}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_tpu_compile
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

run() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
  "${@:2}" > "$LOG/$1.log" 2>&1
  echo "rc=$?" | tee -a "$LOG/summary.txt"
  grep -v WARNING "$LOG/$1.log" | tail -15 >> "$LOG/summary.txt"
}

# 1. v1 fwd gap: is it the dense attention? pallas_trainable A/B
run v1bd_pallas python tools/probe_train_breakdown.py ablate=1 attn_impl=pallas_trainable
run v1bd_dense python tools/probe_train_breakdown.py ablate=1

# 2. v1 lighter remat retry (isolated process, post-500)
run train_v1_qfa python bench.py metric=train remat=qkv_fc1_attn
run train_v1_qfa_pallas python bench.py metric=train remat=qkv_fc1_attn attn_impl=pallas_trainable

# 3. v2 train: push batch with the working rung
run train_v2_qfa_b3 python bench.py metric=train_v2 remat=qkv_fc1_attn batch=3 iters=5

# 4. v2 train breakdown at the new best config
run v2bd_qfa_b2 python tools/probe_train_v2_breakdown.py ablate=1 remat=qkv_fc1_attn batch=2

# 5. t2v: suite shape + long-clip streaming routing
run t2v_bd_t2 python tools/probe_t2v_breakdown.py latent_frames=2
run t2v_bd_t5 python tools/probe_t2v_breakdown.py latent_frames=5
run t2v_T5 python bench.py metric=t2v latent_frames=5

echo "SWEEP2 DONE $(date +%H:%M:%S)" | tee -a "$LOG/summary.txt"
