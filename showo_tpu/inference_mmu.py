"""CLI entry: Show-o v1 multimodal understanding (captioning / VQA).

    python -m showo_tpu.inference_mmu config=configs/showo_demo.yaml \
        mmu_image_root=./mmu_validation 'question=Describe this image. *** Is it cute?'

Parity with inference_mmu.py: images from mmu_image_root, multi-question
splitting on ' *** ', discrete VQ-token path (option a) by default.
"""

from __future__ import annotations

import os

import jax

from showo_tpu.config import get_config
from showo_tpu.inference_t2i import (
    build_showo_config,
    load_params,
    load_tokenizer,
    load_vq,
)
from showo_tpu.pipelines.mmu import MMUPipeline
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def build_pipeline(config) -> MMUPipeline:
    """Construct the v1 MMU pipeline from a config (shared by this CLI
    and the eval sweep, evaluation/mmu_eval.py)."""
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length)
    return MMUPipeline(
        cfg=cfg, params=params, vq_cfg=vq_cfg,
        vq_params=vq_params, uni_prompting=uni,
        max_new_tokens=int(config.get("max_new_tokens", 100)),
        top_k=int(config.get("top_k", 1)),
        top_p=(float(config["top_p"]) if "top_p" in config else None),
        quantize_int8=bool(int(config.get("int8", 0))))


def main() -> None:
    config = get_config()
    pipe = build_pipeline(config)
    cfg, uni = pipe.cfg, pipe.uni_prompting

    from showo_tpu.utils.image import clip_image_transform, image_transform
    from PIL import Image

    # Continuous CLIP-ViT feature path (inference_mmu.py:73-75, 100, 133):
    # the reference always builds the 336px CLIP-L tower and routes through
    # it when model.showo.w_clip_vit.  `clip_s2_scales` opts into the
    # CLIPVisionTowerS2 multiscale variant (clip_encoder.py:85-140).
    w_clip = bool(config.model.showo.get("w_clip_vit", False))
    clip_fn = None
    if w_clip:
        import numpy as np

        from showo_tpu.models.clip_vit import (ClipVitConfig,
                                               clip_vit_features,
                                               clip_vit_features_s2,
                                               init_clip_vit_params)

        # optional dim overrides (tiny e2e runs); defaults = CLIP-L/14-336
        clip_cfg = ClipVitConfig(
            **{k: int(v) for k, v in
               dict(config.model.showo.get("clip_vit", {})).items()})
        clip_path = str(config.model.showo.get(
            "vision_tower_path", "openai/clip-vit-large-patch14-336"))
        if os.path.exists(clip_path):
            from showo_tpu.utils.checkpoint import load_clip_weights

            logger.info("importing CLIP-ViT weights from %s", clip_path)
            clip_params = jax.tree.map(jax.numpy.asarray,
                                       load_clip_weights(clip_path))
        else:
            logger.warning("vision_tower_path=%s not found; random init",
                           clip_path)
            clip_params = init_clip_vit_params(clip_cfg, jax.random.PRNGKey(2))
        s2 = config.model.showo.get("clip_s2_scales", None)
        if s2:
            scales = tuple(int(v) for v in str(s2).split(","))
            clip_fn = jax.jit(lambda px: clip_vit_features_s2(
                clip_cfg, clip_params, px, scales=scales))
            clip_size = max(scales)
        else:
            clip_fn = jax.jit(
                lambda px: clip_vit_features(clip_cfg, clip_params, px))
            clip_size = clip_cfg.image_size

    root = config.mmu_image_root
    questions = str(config.question).split(" *** ")
    key = jax.random.PRNGKey(int(config.get("seed", 0)))

    for fname in sorted(os.listdir(root)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        pil = Image.open(os.path.join(root, fname)).convert("RGB")
        img = image_transform(pil, config.dataset.params.resolution)
        if w_clip:
            feats = clip_fn(np.asarray(
                clip_image_transform(pil, clip_size))[None])
        for q in questions:
            key, k = jax.random.split(key)
            if w_clip:
                # inference_mmu.py:32-34,108: llava system prompt prefix
                sys_txt = ("A chat between a curious user and an artificial "
                           "intelligence assistant. The assistant gives "
                           "helpful, detailed, and polite answers to the "
                           "user's questions.")
                sys_ids = np.asarray(
                    uni.text_tokenizer([sys_txt])["input_ids"][0], np.int64)
                toks = pipe.answer_with_clip(np.asarray(feats[0]), q,
                                             sys_ids, k)
            else:
                toks = pipe.answer(img, q, k)
            try:
                text = uni.text_tokenizer.batch_decode(
                    [toks], skip_special_tokens=True)[0]
            except AttributeError:
                text = str(toks)
            print(f"[{fname}] User: {q}\n Answer: {text}")


if __name__ == "__main__":
    main()
