"""CLI entry: Show-o2 interleaved mixed-modality generation.

    python -m showo_tpu.inference_mixed_modality \
        config=configs/showo2_1.5b_demo_432x432.yaml \
        'prompt=Tell me a short story with pictures.' num_rounds=3
"""

from __future__ import annotations

import os

import jax

from showo_tpu.config import get_config
from showo_tpu.inference_mmu_v2 import load_models
from showo_tpu.inference_t2i_v2 import (
    build_showo2_config,
    load_tokenizer_and_ids,
)
from showo_tpu.pipelines.mixed_modality import MixedModalityPipeline
from showo_tpu.utils.image import to_pil_images
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def main() -> None:
    config = get_config()
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)
    params, vae_cfg, vae_params = load_models(config, cfg)

    pipe = MixedModalityPipeline(
        cfg=cfg, params=params, vae_cfg=vae_cfg, vae_params=vae_params,
        tokenizer=tokenizer, token_ids=token_ids,
        guidance_scale=float(config.get("guidance_scale", 5.0)),
        num_steps=int(config.transport.get("num_inference_steps", 20)),
        max_new_tokens=int(config.get("max_new_tokens", 60)))

    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    rounds, images = pipe.generate(str(config.prompt), key,
                                   num_rounds=int(config.get("num_rounds", 3)))

    outdir = config.get("output_dir", "outputs_mixed")
    os.makedirs(outdir, exist_ok=True)
    for i, r in enumerate(rounds):
        try:
            text = tokenizer.batch_decode([r], skip_special_tokens=True)[0]
        except AttributeError:
            text = str(r)
        print(f"round {i}: {text}")
    for i, im in enumerate(to_pil_images(images)):
        im.save(os.path.join(outdir, f"mixed_{i:03d}.png"))
    logger.info("wrote %d images to %s", len(images), outdir)


if __name__ == "__main__":
    main()
