"""CLI entry: Show-o2 text-to-image generation (flow matching).

    python -m showo_tpu.inference_t2i_v2 config=configs/showo2_1.5b_demo_432x432.yaml \
        validation_prompts_file=validation_prompts/text2image_prompts.txt

Parity with show-o2/inference_t2i.py; weights import from local torch
checkpoints or random-init for smoke runs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from showo_tpu.config import get_config
from showo_tpu.pipelines.t2i_v2 import T2IV2Pipeline
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)

QWEN_TOKEN_IDS = {  # qwen2.5 vocab ids (misc.py:371-386)
    "bos_id": 151644,   # <|im_start|>
    "eos_id": 151645,   # <|im_end|>
    "boi_id": 151652,   # <|vision_start|>
    "eoi_id": 151653,   # <|vision_end|>
    "img_pad_id": 151655,  # <|image_pad|>
    "vid_pad_id": 151656,  # <|video_pad|>
    "pad_id": 151936,   # [PAD] (added)
}


def build_showo2_config(config) -> Showo2Config:
    m = config.model.showo
    llm = Qwen2Config(
        hidden_size=m.hidden_size,
        vocab_size=m.get("llm_vocab_size") or 151940,
        intermediate_size=m.get("llm_intermediate_size", 8960),
        num_layers=m.get("llm_num_layers", 28),
        num_heads=m.get("llm_num_heads", 12),
        num_kv_heads=m.get("llm_num_kv_heads", 2),
        head_dim=m.get("llm_head_dim", 128),
        tie_word_embeddings=m.get("llm_tie_word_embeddings", True),
    )
    from showo_tpu.show_o2.dit import DiffusionHeadConfig
    from showo_tpu.show_o2.siglip import SigLipConfig

    # optional dim-override dicts for tiny e2e CLI runs (the analog of
    # the v1 CLI's `model.showo.phi:` block); defaults = released dims
    sig = {k: int(v) for k, v in dict(m.get("siglip", {})).items()}
    dit_ov = {k: int(v) for k, v in dict(m.get("dit", {})).items()}

    return Showo2Config(
        llm=llm,
        siglip=SigLipConfig(**sig),
        dit=DiffusionHeadConfig(num_layers=m.get("num_diffusion_layers", 10),
                                **dit_ov),
        image_latent_dim=m.image_latent_dim,
        image_latent_height=m.image_latent_height,
        image_latent_width=m.image_latent_width,
        patch_size=m.patch_size,
        clip_latent_dim=m.clip_latent_dim,
        add_time_embeds=m.add_time_embeds,
    )


def load_tokenizer_and_ids(config):
    path = config.model.showo.llm_model_path
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)
        tok.add_special_tokens({"pad_token": "[PAD]"})
        for t in ("<image>", "<|vid_start|>", "<|vid_end|>"):
            tok.add_tokens(t)
        vocab = tok.get_vocab()
        ids = {
            "bos_id": vocab["<|im_start|>"],
            "eos_id": tok.eos_token_id,
            "boi_id": vocab["<|vision_start|>"],
            "eoi_id": vocab["<|vision_end|>"],
            "img_pad_id": vocab["<|image_pad|>"],
            "vid_pad_id": vocab["<|video_pad|>"],
            "pad_id": tok.pad_token_id,
        }
        return tok, ids
    except Exception as e:
        logger.warning("tokenizer %s unavailable (%s); using FakeTokenizer",
                       path, e)
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from fake_tokenizer import FakeTokenizer

        class Tok:
            def __init__(self):
                self._t = FakeTokenizer()

            def __call__(self, text, add_special_tokens=False):
                return {"input_ids": self._t(text)["input_ids"][0]}

        ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
                   img_pad_id=6, vid_pad_id=7)
        return Tok(), ids


def build_pipeline(config) -> "T2IV2Pipeline":
    """Config -> ready T2IV2Pipeline (weights imported or random-init).

    Shared by this CLI and evaluation.run_quality."""
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)

    ckpt = config.model.showo.pretrained_model_path
    if ckpt != "random" and os.path.exists(str(ckpt)):
        from showo_tpu.utils.checkpoint import _load_dir_or_file
        from showo_tpu.utils.torch_import import showo2_params_from_torch

        logger.info("importing Showo2 weights from %s", ckpt)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16),
            showo2_params_from_torch(_load_dir_or_file(str(ckpt))))
    else:
        logger.warning("random-init Showo2 (checkpoint %s not found)", ckpt)
        params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
            jax.random.PRNGKey(0))

    vae_cfg = WanVAEConfig()
    vae_path = config.model.vae_model.pretrained_model_path
    if os.path.exists(str(vae_path)):
        from showo_tpu.utils.checkpoint import load_wan_vae_weights

        vae_params = jax.tree.map(jnp.asarray, load_wan_vae_weights(vae_path))
    else:
        logger.warning("random-init WanVAE (%s not found)", vae_path)
        vae_params = init_wan_vae_params(vae_cfg, jax.random.PRNGKey(1))

    pipe = T2IV2Pipeline(
        cfg=cfg, params=params, vae_cfg=vae_cfg, vae_params=vae_params,
        tokenizer=tokenizer, token_ids=token_ids,
        guidance_scale=float(config.get("guidance_scale", 7.5)),
        num_steps=int(config.transport.get("num_inference_steps", 50)),
        time_shifting_factor=float(config.transport.get("time_shifting_factor", 3.0)),
        max_text_len=int(config.dataset.preprocessing.get("max_text_len", 256)),
        sampling_method=str(config.transport.get("sampling_method", "euler")),
    )
    return pipe


def main() -> None:
    config = get_config()
    pipe = build_pipeline(config)

    from showo_tpu.utils.assets import validation_prompts_file

    with open(validation_prompts_file(
            config.get("validation_prompts_file"))) as f:
        prompts = f.read().splitlines()
    batch_size = int(config.get("batch_size", 4))
    outdir = config.get("output_dir", "outputs_v2")
    os.makedirs(outdir, exist_ok=True)

    from showo_tpu.utils.image import to_pil_images

    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    for step in range(0, len(prompts), batch_size):
        chunk = prompts[step:step + batch_size]
        key, k = jax.random.split(key)
        images = pipe.generate(chunk, k)
        for i, im in enumerate(to_pil_images(images)):
            im.save(os.path.join(outdir, f"t2i_{step + i:05d}.png"))
        logger.info("generated %d images (step %d)", len(chunk), step)


if __name__ == "__main__":
    main()
