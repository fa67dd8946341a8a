"""Show-o v1 text-to-image pipelines: t2i / inpainting / extrapolation.

Ports the three modes of inference_t2i.py (:80-344) on top of the compiled
MaskGIT loop.  All device work (sequence assembly aside) happens inside
jit; the extrapolation stitcher keeps the reference's sliding half-canvas
shifts (:166-284).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import ShowoConfig, showo_t2i_generate
from showo_tpu.ops.masks import omni_mask_predict_next
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.sampling.schedules import get_mask_schedule


@dataclasses.dataclass
class T2IPipeline:
    cfg: ShowoConfig
    params: dict                   # {"showo": ...}
    vq_cfg: VQConfig
    vq_params: dict                # MagvitV2 params
    uni_prompting: UniversalPrompting
    guidance_scale: float = 1.75
    timesteps: int = 16
    temperature: float = 1.0
    mask_schedule: str = "cosine"
    max_seq_length: int = 128
    resolution: int = 256
    attn_impl: str = "auto"   # auto: packed Pallas kernel at long seqs
    param_fusion: str = "mlp"  # "mlp" | "qkv" | "none" (exact parity)

    def __post_init__(self):
        self._vq = MagvitV2(self.vq_cfg)
        self._schedule = get_mask_schedule(self.mask_schedule)

        # inference-only weight re-layout: "qkv" fuses the three attention
        # projections (numerically identical); "mlp" additionally exploits
        # the parallel residual to collapse each layer to TWO wide matmuls
        # (fp32-accumulation order differs at eps level) — +23% img/min at
        # 256^2 decode (tools/probe_decode_breakdown.py)
        if self.param_fusion == "mlp":
            from showo_tpu.models.phi import fuse_parallel_mlp
            self.params = dict(self.params,
                               showo=fuse_parallel_mlp(self.params["showo"]))
        elif self.param_fusion == "qkv":
            from showo_tpu.models.phi import fuse_qkv
            self.params = dict(self.params,
                               showo=fuse_qkv(self.params["showo"]))

        cfg = self.cfg
        from showo_tpu.models.showo import showo_t2i_generate_cached

        impl = self.attn_impl
        if impl == "auto":
            impl = "pallas_packed" if cfg.num_vq_tokens >= 1024 else "dense"
        use_pallas = impl if impl.startswith("pallas") else False
        sp = self.uni_prompting.sptids

        @jax.jit
        def _generate(params, ids, uncond_ids, bias, key):
            return showo_t2i_generate_cached(
                cfg, params, ids, key, uncond_input_ids=uncond_ids,
                attention_bias=bias, guidance_scale=self.guidance_scale,
                temperature=self.temperature, timesteps=self.timesteps,
                noise_schedule=self._schedule,
                max_seq_length=self.max_seq_length,
                use_pallas_attention=use_pallas,
                pad_id=sp["<|pad|>"], soi_id=sp["<|soi|>"],
                eoi_id=sp["<|eoi|>"])

        @jax.jit
        def _decode(vq_params, codes):
            return self._vq.apply({"params": vq_params}, codes,
                                  method=self._vq.decode_code)

        @jax.jit
        def _decode_hw(vq_params, codes, hw):
            return self._vq.apply({"params": vq_params}, codes, hw,
                                  method=self._vq.decode_code)

        @jax.jit
        def _encode(vq_params, pixels):
            return self._vq.apply({"params": vq_params}, pixels,
                                  method=self._vq.get_code)

        self._generate = _generate
        self._decode = _decode
        self._encode = _encode

    # -- helpers ---------------------------------------------------------
    @property
    def _text_vocab(self) -> int:
        """len(tokenizer) analogue: codebook offset in the unified vocab."""
        return self.cfg.codebook_offset

    def _build_inputs(self, prompts: Sequence[str], image_tokens: np.ndarray):
        ids, _ = self.uni_prompting((list(prompts), image_tokens), "t2i_gen")
        uncond_ids, _ = self.uni_prompting(
            ([""] * len(prompts), image_tokens), "t2i_gen")
        pair = np.concatenate([ids, uncond_ids], axis=0) \
            if self.guidance_scale > 0 else ids
        bias = omni_mask_predict_next(
            jnp.asarray(pair), pad_id=self.uni_prompting.sptids["<|pad|>"],
            soi_id=self.uni_prompting.sptids["<|soi|>"],
            eoi_id=self.uni_prompting.sptids["<|eoi|>"],
            rm_pad_in_image=True)
        uncond = jnp.asarray(uncond_ids) if self.guidance_scale > 0 else None
        return jnp.asarray(ids), uncond, bias

    def _run(self, prompts, image_tokens, key):
        ids, uncond_ids, bias = self._build_inputs(prompts, image_tokens)
        if uncond_ids is None:
            uncond_ids = ids  # unused when guidance_scale == 0
        codes = self._generate(self.params, ids, uncond_ids, bias, key)
        return jnp.clip(codes, 0, self.cfg.codebook_size - 1)

    # -- modes -----------------------------------------------------------
    def generate(self, prompts: Sequence[str], key) -> np.ndarray:
        """t2i mode: all-mask init.  Returns NHWC float images in [-1,1]."""
        B = len(prompts)
        image_tokens = np.full((B, self.cfg.num_vq_tokens),
                               self.cfg.mask_token_id, np.int64)
        codes = self._run(prompts, image_tokens, key)
        return np.asarray(self._decode(self.vq_params, codes))

    def inpaint(self, prompt: str, image_nhwc: np.ndarray,
                mask_hw: np.ndarray, key, batch_size: int = 1) -> np.ndarray:
        """inpainting mode (inference_t2i.py:80-131): overwrite masked
        token positions with mask_token_id."""
        from showo_tpu.utils.image import bicubic_resize_mask

        prompts = [prompt] * batch_size
        pixels = jnp.asarray(image_nhwc)[None].repeat(batch_size, axis=0)
        tokens = np.asarray(self._encode(self.vq_params, pixels)) + self._text_vocab
        lowres = bicubic_resize_mask(mask_hw, self.resolution // 16)
        mask_flat = lowres.reshape(-1).astype(bool)
        tokens[:, mask_flat] = self.cfg.mask_token_id
        codes = self._run(prompts, tokens, key)
        return np.asarray(self._decode(self.vq_params, codes))

    def extrapolate(self, prompts: Sequence[str], directions: Sequence[str],
                    image_nhwc: np.ndarray, key, offset: int = 0,
                    batch_size: int = 1) -> np.ndarray:
        """extrapolation mode (inference_t2i.py:166-284): sliding
        half-canvas shifts with re-generation and stitching."""
        W = self.resolution // 16
        shift = W // 2 - offset
        text_vocab = self._text_vocab
        mask_id = self.cfg.mask_token_id

        gen_grid = None
        for idx, (prt, direction) in enumerate(zip(prompts, directions)):
            batch_prompts = [prt] * batch_size
            if idx == 0:
                pixels = jnp.asarray(image_nhwc)[None]
                tokens = np.asarray(self._encode(self.vq_params, pixels)) + text_vocab
                grid = tokens.reshape(1, W, W).repeat(batch_size, axis=0)
            else:
                grid = gen_grid + text_vocab

            left = grid[:, :, :-shift] - text_vocab
            right = grid[:, :, shift:] - text_vocab
            up = grid[:, :-shift, :] - text_vocab
            down = grid[:, shift:, :] - text_vocab

            if direction in ("left", "right"):
                blank = np.full((batch_size, W, W // 2 + offset), mask_id, np.int64)
            else:
                blank = np.full((batch_size, W // 2 + offset, W), mask_id, np.int64)

            if direction == "left":
                window = np.concatenate([blank, grid[:, :, :shift]], axis=-1)
            elif direction == "right":
                window = np.concatenate([grid[:, :, -shift:], blank], axis=-1)
            elif direction == "up":
                window = np.concatenate([blank, grid[:, :shift, :]], axis=-2)
            else:
                window = np.concatenate([grid[:, -shift:, :], blank], axis=-2)

            codes = np.asarray(self._run(
                batch_prompts, window.reshape(batch_size, -1), key))
            key, _ = jax.random.split(key)
            codes = codes.reshape(batch_size, W, W)

            if direction == "left":
                gen_grid = np.concatenate([codes, right], axis=-1)
            elif direction == "right":
                gen_grid = np.concatenate([left, codes], axis=-1)
            elif direction == "up":
                gen_grid = np.concatenate([codes, down], axis=-2)
            else:
                # reference quirk: 'down' stitches with image_LEFT_part on
                # axis -2 (inference_t2i.py:276) — we use up_part, the
                # geometrically correct one
                gen_grid = np.concatenate([up, codes], axis=-2)

        _, h, w = gen_grid.shape
        flat = jnp.asarray(gen_grid.reshape(batch_size, -1))
        images = self._vq.apply({"params": self.vq_params}, flat, (h, w),
                                method=self._vq.decode_code)
        return np.asarray(images)
