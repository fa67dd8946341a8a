#!/bin/bash
# Round-5 TPU measurement sweep — run in background once the tunnel is
# healthy.  Each step is its own process; a wedge kills only that step.
# Usage: bash tools/r5_tpu_sweep.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5sweep}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax_tpu_compile
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

run() {  # run <name> <cmd...>
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
  "${@:2}" > "$LOG/$1.log" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$LOG/summary.txt"
  grep -v WARNING "$LOG/$1.log" | tail -20 >> "$LOG/summary.txt"
}

# 0. health
run health python -c "import jax,jax.numpy as jnp; x=jnp.ones((256,256),jnp.bfloat16); print('ok', float((x@x).sum()))"

# 1. v2 train breakdown (remat=full baseline)
run v2bd_full python tools/probe_train_v2_breakdown.py ablate=1

# 2. v2 train: does the lighter ladder compile now? (prevent_cse fix)
run train_v2_qfa python bench.py metric=train_v2 remat=qkv_fc1_attn iters=5
run train_v2_qfa_b2 python bench.py metric=train_v2 remat=qkv_fc1_attn batch=2 iters=5
run train_v2_qa_b2 python bench.py metric=train_v2 remat=qkv_attn batch=2 iters=5

# 3. v1 train ladder + breakdown
run v1bd python tools/probe_train_breakdown.py ablate=1
run train_v1_qfa python bench.py metric=train remat=qkv_fc1_attn
run train_v1_qf python bench.py metric=train remat=qkv_fc1

# 4. v2 t2i batch scaling
run t2iv2_b2 python bench.py metric=t2i_v2 batch=2
run t2iv2_b4 python bench.py metric=t2i_v2 batch=4

# 5. t2v roofline
run t2v_bd python tools/probe_t2v_breakdown.py latent_frames=5

echo "SWEEP DONE $(date +%H:%M:%S)" | tee -a "$LOG/summary.txt"
