"""Show-o v1 long-video generation (lvg) pipeline.

The reference trains an lvg task (training/prompting_utils.py:309-390 +
create_attention_mask_lvg :513-538) — text conditioning plus a chain of
per-frame soi..eoi token spans, causal across frames and bidirectional
within each — but ships no generation driver for it.  This pipeline closes
the loop: frames are generated autoregressively in frame order, each new
frame denoised by the compiled MaskGIT loop while attending to a sliding
window of previously generated frames through the lvg mask.

Sequence for frame f with k context frames (window ``context_frames``):

    [pad.. t2i bos text eos] [soi F_{f-k} eoi] .. [soi F_{f-1} eoi] [soi ?? eoi]

Frame 0 degenerates to plain t2i.  Each distinct context count compiles
once (at most ``context_frames + 1`` programs); the steady state reuses a
single compiled loop per frame.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import ShowoConfig, showo_t2i_generate
from showo_tpu.ops.masks import omni_mask_lvg
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.sampling.schedules import get_mask_schedule


@dataclasses.dataclass
class LVGPipeline:
    cfg: ShowoConfig
    params: dict
    vq_cfg: VQConfig
    vq_params: dict
    uni_prompting: UniversalPrompting
    guidance_scale: float = 1.75
    timesteps: int = 16
    temperature: float = 1.0
    mask_schedule: str = "cosine"
    context_frames: int = 2

    def __post_init__(self):
        self._vq = MagvitV2(self.vq_cfg)
        self._schedule = get_mask_schedule(self.mask_schedule)
        self._gen_cache = {}

        @jax.jit
        def _decode(vq_params, codes):
            return self._vq.apply({"params": vq_params}, codes,
                                  method=self._vq.decode_code)

        @jax.jit
        def _encode(vq_params, pixels):
            return self._vq.apply({"params": vq_params}, pixels,
                                  method=self._vq.get_code)

        self._decode = _decode
        self._encode = _encode

    def _gen_fn(self, num_spans: int, seq_len: int):
        """Per-(context count) compiled MaskGIT step."""
        key_ = (num_spans, seq_len)
        if key_ not in self._gen_cache:
            cfg = self.cfg
            sp = self.uni_prompting.sptids
            N = cfg.num_vq_tokens

            @jax.jit
            def _generate(params, ids, uncond_ids, key):
                pair = (jnp.concatenate([ids, uncond_ids], axis=0)
                        if self.guidance_scale > 0 else ids)
                bias = omni_mask_lvg(pair, pad_id=sp["<|pad|>"],
                                     soi_id=sp["<|soi|>"],
                                     eoi_id=sp["<|eoi|>"],
                                     num_images=num_spans)
                return showo_t2i_generate(
                    cfg, params, ids, key, uncond_input_ids=uncond_ids,
                    attention_bias=bias,
                    guidance_scale=self.guidance_scale,
                    temperature=self.temperature, timesteps=self.timesteps,
                    noise_schedule=self._schedule,
                    # prompt_len = everything before the final masked span
                    max_seq_length=seq_len - N - 2,
                    pad_id=sp["<|pad|>"], soi_id=sp["<|soi|>"],
                    eoi_id=sp["<|eoi|>"])

            self._gen_cache[key_] = _generate
        return self._gen_cache[key_]

    def _frame_payload(self, context: List[np.ndarray], batch: int) -> np.ndarray:
        """[F_a eoi soi F_b eoi soi .. ??_N] — the prompt builder adds the
        outer soi/eoi, yielding one span per frame."""
        sp = self.uni_prompting.sptids
        off = self.cfg.codebook_offset
        N = self.cfg.num_vq_tokens
        parts = []
        for c in context:
            parts.append(c + off)
            parts.append(np.full((batch, 1), sp["<|eoi|>"], np.int64))
            parts.append(np.full((batch, 1), sp["<|soi|>"], np.int64))
        masked = np.full((batch, N), self.cfg.mask_token_id, np.int64)
        if parts:
            return np.concatenate(parts + [masked], axis=1)
        return masked

    def generate(self, prompts: Sequence[str], num_frames: int, key,
                 first_frame_nhwc: Optional[np.ndarray] = None) -> np.ndarray:
        """Returns NHWC float frames [B, T, H, W, 3] in [-1, 1].  Passing
        ``first_frame_nhwc`` ([B, H, W, 3]) conditions on a given first
        frame (image-to-video)."""
        B = len(prompts)
        frames: List[np.ndarray] = []
        if first_frame_nhwc is not None:
            codes0 = np.asarray(
                self._encode(self.vq_params, jnp.asarray(first_frame_nhwc)))
            frames.append(codes0.astype(np.int64))

        while len(frames) < num_frames:
            ctx = frames[-self.context_frames:]
            payload = self._frame_payload([np.asarray(c) for c in ctx], B)
            ids, _ = self.uni_prompting((list(prompts), payload), "lvg_gen")
            uncond_ids, _ = self.uni_prompting(([""] * B, payload), "lvg_gen")
            key, k = jax.random.split(key)
            gen = self._gen_fn(len(ctx) + 1, ids.shape[1])
            codes = gen(self.params, jnp.asarray(ids), jnp.asarray(uncond_ids),
                        k)
            codes = jnp.clip(codes, 0, self.cfg.codebook_size - 1)
            frames.append(np.asarray(codes).astype(np.int64))

        out = [np.asarray(self._decode(self.vq_params, jnp.asarray(c)))
               for c in frames]
        return np.stack(out, axis=1)
