#!/usr/bin/env bash
# Show-o v1 stage-1 pretraining launch.  No accelerate/DeepSpeed configs:
# the jax runtime handles multi-host rendezvous; mesh axes come from the
# `parallel:` section of the config.
set -euo pipefail

python -m showo_tpu.training.train_showo \
    config=${1:-configs/showo_pretraining_stage1.yaml}
