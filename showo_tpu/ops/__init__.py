from showo_tpu.ops.masks import (
    NEG_INF,
    omni_mask_predict_next,
    omni_mask_mmu,
    omni_mask_mmu_vit,
    omni_mask_lvg,
    omni_mask_lvg_v2,
    to_additive,
)
