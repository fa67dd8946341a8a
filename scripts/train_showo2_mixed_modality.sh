#!/usr/bin/env bash
# Downstream mixed-modality two-phase recipe (show-o2/README.md:293-309):
# phase 1 trains with the und path + LLM frozen; phase 2 resumes with
# everything trainable and a larger step budget.
set -euo pipefail

CFG=${CFG:-configs/showo2_1.5b_downstream_mixed_modality_simple.yaml}
PHASE2_STEPS=${PHASE2_STEPS:-50000}

# phase 1: warm-up with frozen und/LLM (frozen_params from the config)
python -m showo_tpu.show_o2.train_mixed_modality config="$CFG"

# phase 2: unfreeze everything, resume from the phase-1 checkpoint
python -m showo_tpu.show_o2.train_mixed_modality config="$CFG" \
    model.frozen_params=[] training.max_train_steps="$PHASE2_STEPS"
