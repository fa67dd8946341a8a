"""CLI entry: Show-o2 multimodal understanding (image VQA).

    python -m showo_tpu.inference_mmu_v2 config=configs/showo2_1.5b_demo_432x432.yaml \
        mmu_image_root=./mmu_validation 'question=Describe this image.'
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from showo_tpu.config import get_config
from showo_tpu.inference_t2i_v2 import (
    build_showo2_config,
    load_tokenizer_and_ids,
)
from showo_tpu.pipelines.mmu_v2 import MMUV2Pipeline
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def load_models(config, cfg):
    ckpt = config.model.showo.pretrained_model_path
    if ckpt != "random" and os.path.exists(str(ckpt)):
        from showo_tpu.utils.checkpoint import _load_dir_or_file
        from showo_tpu.utils.torch_import import showo2_params_from_torch

        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                              showo2_params_from_torch(_load_dir_or_file(str(ckpt))))
    else:
        logger.warning("random-init Showo2 (%s not found)", ckpt)
        params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
            jax.random.PRNGKey(0))

    vae_cfg = WanVAEConfig()
    vae_path = config.model.vae_model.pretrained_model_path
    if os.path.exists(str(vae_path)):
        from showo_tpu.utils.checkpoint import load_wan_vae_weights

        vae_params = jax.tree.map(jnp.asarray, load_wan_vae_weights(str(vae_path)))
    else:
        logger.warning("random-init WanVAE (%s not found)", vae_path)
        vae_params = init_wan_vae_params(vae_cfg, jax.random.PRNGKey(1))
    return params, vae_cfg, vae_params


def main() -> None:
    config = get_config()
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)
    params, vae_cfg, vae_params = load_models(config, cfg)

    pipe = MMUV2Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                         vae_params=vae_params, tokenizer=tokenizer,
                         token_ids=token_ids,
                         max_new_tokens=int(config.get("max_new_tokens", 300)),
                         top_k=int(config.get("top_k", 1)),
                         top_p=(float(config["top_p"]) if "top_p" in config else None),
                         quantize_int8=bool(int(config.get("int8", 0))))

    from PIL import Image

    from showo_tpu.utils.image import image_transform

    root = config.mmu_image_root
    questions = str(config.question).split(" *** ")
    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    res = config.dataset.preprocessing.resolution
    for fname in sorted(os.listdir(root)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = image_transform(Image.open(os.path.join(root, fname)).convert("RGB"), res)
        for q in questions:
            key, k = jax.random.split(key)
            toks = pipe.answer(img, q, k)
            try:
                text = tokenizer.batch_decode([toks], skip_special_tokens=True)[0]
            except AttributeError:
                text = str(toks)
            print(f"[{fname}] User: {q}\n Answer: {text}")


if __name__ == "__main__":
    main()
