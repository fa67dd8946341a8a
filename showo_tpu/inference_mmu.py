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


def main() -> None:
    config = get_config()
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length)

    pipe = MMUPipeline(cfg=cfg, params=params, vq_cfg=vq_cfg,
                       vq_params=vq_params, uni_prompting=uni,
                       max_new_tokens=int(config.get("max_new_tokens", 100)),
                       top_k=int(config.get("top_k", 1)),
                       top_p=(float(config["top_p"]) if "top_p" in config else None))

    from showo_tpu.utils.image import image_transform
    from PIL import Image

    root = config.mmu_image_root
    questions = str(config.question).split(" *** ")
    key = jax.random.PRNGKey(int(config.get("seed", 0)))

    for fname in sorted(os.listdir(root)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = image_transform(Image.open(os.path.join(root, fname)).convert("RGB"),
                              config.dataset.params.resolution)
        for q in questions:
            key, k = jax.random.split(key)
            toks = pipe.answer(img, q, k)
            try:
                text = uni.text_tokenizer.batch_decode(
                    [toks], skip_special_tokens=True)[0]
            except AttributeError:
                text = str(toks)
            print(f"[{fname}] User: {q}\n Answer: {text}")


if __name__ == "__main__":
    main()
