"""CLI entry: Show-o v1 text-to-image / inpainting / extrapolation.

    python -m showo_tpu.inference_t2i config=configs/showo_demo.yaml \
        mode=t2i batch_size=4 guidance_scale=1.75 generation_timesteps=16

Modes (parity with inference_t2i.py):
  t2i           — generate over the validation prompts file
  inpainting    — prompt=... image_path=... inpainting_mask_path=...
  extrapolation — prompt='a *** b' extra_direction='right *** right'
                  image_path=... [offset=0]

Weights: `model.showo.pretrained_model_path` / `model.vq_model.vq_model_name`
may be local dirs containing reference torch checkpoints (imported on the
fly) or ``random`` for a smoke run.  The tokenizer loads from
`model.showo.llm_model_path` via transformers (local path).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.config import get_config
from showo_tpu.models.magvit import VQConfig
from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.pipelines.t2i import T2IPipeline
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.utils.logging import Tracker, get_logger

logger = get_logger(__name__)


def build_showo_config(config) -> ShowoConfig:
    m = config.model.showo
    return ShowoConfig(
        vocab_size=m.vocab_size,
        llm_vocab_size=m.llm_vocab_size,
        num_new_special_tokens=m.num_new_special_tokens,
        codebook_size=m.codebook_size,
        num_vq_tokens=m.num_vq_tokens,
        w_clip_vit=m.get("w_clip_vit", False),
        clip_feat_dim=(int(dict(m.get("clip_vit", {})).get("hidden_size", 1024))
                       * (len(str(m["clip_s2_scales"]).split(","))
                          if m.get("clip_s2_scales", None) else 1)),
        # attn_fp32=False opts into bf16 softmax scores: +8% decode
        # throughput (STATUS.md); default True = the reference's fp32
        # QK upcast (models/phi.py:359-362), token-exact at fp32
        llm=PhiConfig(vocab_size=m.vocab_size,
                      attn_fp32=bool(m.get("attn_fp32", True)),
                      scan_unroll=int(m.get("scan_unroll", 1)),
                      # optional dim overrides for tiny e2e CLI runs
                      **{k: int(v) for k, v in dict(m.get("phi", {})).items()}),
    )


def load_params(config, cfg: ShowoConfig):
    path = config.model.showo.pretrained_model_path
    if path != "random" and os.path.exists(path):
        from showo_tpu.utils.checkpoint import load_showo_weights

        logger.info("importing Show-o weights from %s", path)
        return jax.tree.map(jnp.asarray, load_showo_weights(path))
    logger.warning("pretrained_model_path=%s not found; random init", path)
    return init_showo_params(cfg, jax.random.PRNGKey(0))


def load_vq(config):
    # optional dim overrides (tiny e2e CLI runs); defaults = MAGVIT-v2
    ov = dict(config.model.vq_model.get("dims", {}))
    vq_cfg = VQConfig(**{k: (tuple(v) if isinstance(v, (list, tuple)) else int(v))
                         for k, v in ov.items()})
    path = config.model.vq_model.vq_model_name
    if path != "random" and os.path.exists(path):
        from showo_tpu.utils.checkpoint import load_magvit_weights

        logger.info("importing MAGVIT-v2 weights from %s", path)
        return vq_cfg, jax.tree.map(jnp.asarray, load_magvit_weights(path))
    logger.warning("vq_model_name=%s not found; random init", path)
    from showo_tpu.models.magvit import MagvitV2

    model = MagvitV2(vq_cfg)
    res = config.dataset.params.resolution
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, res, res, 3)))["params"]
    return vq_cfg, params


def load_tokenizer(config):
    path = config.model.showo.llm_model_path
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path, padding_side="left")
    except Exception as e:  # offline / missing: fall back to the fake
        logger.warning("tokenizer %s unavailable (%s); using FakeTokenizer",
                       path, e)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from fake_tokenizer import FakeTokenizer

        return FakeTokenizer()


def build_pipeline(config) -> T2IPipeline:
    """Config -> ready T2IPipeline (weights imported or random-init).

    Shared by this CLI and evaluation.run_quality."""
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length,
        cond_dropout_prob=config.training.cond_dropout_prob)

    return T2IPipeline(
        cfg=cfg, params=params, vq_cfg=vq_cfg, vq_params=vq_params,
        uni_prompting=uni,
        guidance_scale=float(config.get("guidance_scale",
                                        config.training.guidance_scale)),
        timesteps=int(config.get("generation_timesteps",
                                 config.training.generation_timesteps)),
        mask_schedule=config.training.get("mask_schedule", "cosine"),
        max_seq_length=config.dataset.preprocessing.max_seq_length,
        resolution=config.dataset.params.resolution,
    )


def main() -> None:
    config = get_config()
    pipe = build_pipeline(config)
    batch_size = int(config.get("batch_size", 4))
    mode = config.get("mode", "t2i")
    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    tracker = Tracker(project=config.experiment.project,
                      name=config.experiment.name,
                      enabled=bool(config.get("wandb_enabled", False)))
    outdir = config.get("output_dir", "outputs")
    os.makedirs(outdir, exist_ok=True)

    from showo_tpu.utils.image import image_transform, to_pil_images

    if mode == "t2i":
        from showo_tpu.utils.assets import validation_prompts_file

        vp = validation_prompts_file(
            config.get("validation_prompts_file",
                       config.dataset.params.validation_prompts_file))
        with open(vp) as f:
            prompts = f.read().splitlines()
        for step in range(0, len(prompts), batch_size):
            chunk = prompts[step:step + batch_size]
            key, k = jax.random.split(key)
            images = pipe.generate(chunk, k)
            for i, im in enumerate(to_pil_images(images)):
                im.save(os.path.join(outdir, f"t2i_{step + i:05d}.png"))
            tracker.log({"generated": len(chunk)}, step=step)
            logger.info("generated %d images (step %d)", len(chunk), step)

    elif mode == "inpainting":
        from PIL import Image

        from showo_tpu.utils.assets import inpainting_pair

        src_path, mask_path = inpainting_pair(
            config.get("image_path"), config.get("inpainting_mask_path"))
        img = image_transform(Image.open(src_path).convert("RGB"),
                              config.dataset.params.resolution)
        mask = image_transform(
            Image.open(mask_path).convert("L"),
            config.dataset.params.resolution, normalize=False)[:, :, 0]
        images = pipe.inpaint(config.prompt, img, mask, key,
                              batch_size=batch_size)
        for i, im in enumerate(to_pil_images(images)):
            im.save(os.path.join(outdir, f"inpaint_{i:03d}.png"))

    elif mode == "extrapolation":
        from PIL import Image

        prompts = [p for p in config.prompt.split(" *** ") if p]
        directions = [d for d in config.extra_direction.split(" *** ") if d]
        img = image_transform(Image.open(config.image_path).convert("RGB"),
                              config.dataset.params.resolution)
        images = pipe.extrapolate(prompts, directions, img, key,
                                  offset=int(config.get("offset", 0)),
                                  batch_size=batch_size)
        for i, im in enumerate(to_pil_images(images)):
            im.save(os.path.join(outdir, f"extrapolate_{i:03d}.png"))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
