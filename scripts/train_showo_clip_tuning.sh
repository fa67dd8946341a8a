#!/usr/bin/env bash
# v1 CLIP-ViT tuning chaining (train_w_clip_vit.py recipes): tuning
# stage 1 (llava_pretrain, projector warm-up) then stage 2 (llava_tuning).
set -euo pipefail

promote() {
  local latest
  latest=$(ls -d "$1"/checkpoint-* | sort -t- -k2 -n | tail -1)
  mkdir -p "$2"
  cp -r "$latest" "$2/checkpoint-0"
}

python -m showo_tpu.training.train_showo_clip config=configs/showo_instruction_tuning_1_w_clip_vit.yaml
promote show-o-tuning-stage1-w-clip-vit show-o-tuning-stage2-w-clip-vit
python -m showo_tpu.training.train_showo_clip config=configs/showo_instruction_tuning_2_w_clip_vit.yaml
