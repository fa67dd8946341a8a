"""CLI entry: Show-o v1 long-video generation (lvg).

    python -m showo_tpu.inference_lvg config=configs/showo_demo.yaml \
        num_frames=8 context_frames=2 batch_size=2 \
        validation_prompts_file=validation_prompts/showoprompts.txt \
        [image_path=first_frame.png]

The reference trains the lvg task (training/prompting_utils.py:309-390)
but ships no generation entry for it; this driver runs the LVGPipeline
(per-frame MaskGIT over the lvg multi-span masks) and writes each sample
as a horizontal frame strip plus per-frame pngs.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from showo_tpu.config import get_config
from showo_tpu.inference_t2i import (build_showo_config, load_params,
                                     load_tokenizer, load_vq)
from showo_tpu.pipelines.lvg import LVGPipeline
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
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length,
        cond_dropout_prob=config.training.cond_dropout_prob)

    pipe = LVGPipeline(
        cfg=cfg, params=params, vq_cfg=vq_cfg, vq_params=vq_params,
        uni_prompting=uni,
        guidance_scale=float(config.get("guidance_scale",
                                        config.training.guidance_scale)),
        timesteps=int(config.get("generation_timesteps",
                                 config.training.generation_timesteps)),
        mask_schedule=config.training.get("mask_schedule", "cosine"),
        context_frames=int(config.get("context_frames", 2)),
    )

    vp = config.get("validation_prompts_file",
                    config.dataset.params.validation_prompts_file)
    with open(vp) as f:
        prompts = f.read().splitlines()
    batch_size = int(config.get("batch_size", 2))
    num_frames = int(config.get("num_frames", 8))
    outdir = config.get("output_dir", "outputs_lvg")
    os.makedirs(outdir, exist_ok=True)

    first = None
    if config.get("image_path"):
        from PIL import Image

        from showo_tpu.utils.image import image_transform

        res = config.dataset.params.resolution
        im = image_transform(Image.open(config.image_path).convert("RGB"),
                             resolution=res)
        first = np.broadcast_to(im[None], (batch_size, *im.shape)).copy()

    from showo_tpu.utils.image import to_pil_images

    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    for step in range(0, len(prompts), batch_size):
        chunk = prompts[step:step + batch_size]
        if len(chunk) < batch_size:
            chunk = chunk + [chunk[-1]] * (batch_size - len(chunk))
        key, k = jax.random.split(key)
        videos = pipe.generate(chunk, num_frames, k,
                               first_frame_nhwc=first)  # [B, T, H, W, 3]
        for i in range(len(chunk)):
            strip = np.concatenate(list(videos[i]), axis=1)
            to_pil_images(strip[None])[0].save(
                os.path.join(outdir, f"lvg_{step + i:04d}_strip.png"))
            for t, im in enumerate(to_pil_images(videos[i])):
                im.save(os.path.join(outdir,
                                     f"lvg_{step + i:04d}_f{t:03d}.png"))
        logger.info("generated %d videos x %d frames (step %d)",
                    len(chunk), num_frames, step)


if __name__ == "__main__":
    main()
