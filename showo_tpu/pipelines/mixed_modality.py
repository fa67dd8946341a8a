"""Show-o2 interleaved mixed-modality generation.

Ports show-o2/inference_mixed_modality.py:128-267: alternate AR text
generation (stop at eos / vision_start) with flow-matching image
generation in which the history images are clean conditioning (t forced
to 1) and only the last image is denoised
(``only_denoise_last_image=True``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.sampling.ar import ar_generate
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward
from showo_tpu.show_o2.showo2 import Showo2Config, showo2_t2i_velocity
from showo_tpu.show_o2.transport import ode_timegrid, sample_ode_euler
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_decode


@dataclasses.dataclass
class MixedModalityPipeline:
    cfg: Showo2Config
    params: dict
    vae_cfg: WanVAEConfig
    vae_params: dict
    tokenizer: object
    token_ids: dict
    guidance_scale: float = 5.0
    num_steps: int = 20
    time_shifting_factor: float = 3.0
    max_new_tokens: int = 60
    top_k: Optional[int] = 5
    top_p: Optional[float] = None
    fuse_weights: bool = True  # qkv + gate/up wide-matmul fusions

    def __post_init__(self):
        if self.fuse_weights:
            from showo_tpu.show_o2.showo2 import fuse_inference

            self.params = fuse_inference(self.params)

    def _tok(self, text: str) -> List[int]:
        ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        return list(ids)

    def lm_generate(self, prompt_ids: List[int], key) -> List[int]:
        """AR text generation stopping at eos or boi (lm_generate,
        modeling_showo2_qwen2_5.py:576-644), with KV cache."""
        llm, params, ids = self.cfg.llm, self.params, self.token_ids
        prompt = jnp.asarray(prompt_ids)[None]
        B, S = prompt.shape
        cap = S + self.max_new_tokens
        causal = jnp.tril(jnp.ones((cap, cap), bool))
        from showo_tpu.ops.masks import to_additive

        def prefill(p_ids, pb):
            cache = Qwen2KVCache.zeros(llm, B, cap,
                                       dtype=params["showo"]["embed"].dtype)
            logits, _, cache = qwen2_forward(
                llm, params["showo"], input_ids=p_ids,
                attention_bias=to_additive(causal[None, None, :S, :]),
                cache=cache)
            return logits, cache

        def decode(tok_ids, b, cache):
            logits, _, cache = qwen2_forward(llm, params["showo"],
                                             input_ids=tok_ids,
                                             attention_bias=b, cache=cache)
            return logits, cache

        toks, valid = ar_generate(
            prefill, decode, prompt, key,
            max_new_tokens=self.max_new_tokens, top_k=self.top_k,
            top_p=self.top_p,
            eot_token=ids["eos_id"])
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        out = []
        for t in toks[valid].tolist():
            out.append(int(t))
            if t in (ids["eos_id"], ids["boi_id"]):
                break
        return out

    def _denoise_last(self, text_tokens, mp, history_latents, key):
        """ODE-denoise the last image; history images stay clean (t=1).
        The euler solve is jitted (cached by sequence/history shape):
        repeated rounds and calls no longer re-trace the towers."""
        if not hasattr(self, "_denoise_jit"):
            self._denoise_jit = jax.jit(self._denoise_last_impl)
        return self._denoise_jit(self.params, text_tokens, mp,
                                 history_latents, key)

    def _denoise_last_impl(self, params, text_tokens, mp, history_latents,
                           key):
        cfg = self.cfg
        M = mp.shape[1]
        h, w = cfg.image_latent_height, cfg.image_latent_width
        key, k_z = jax.random.split(key)
        z_new = jax.random.normal(k_z, (1, cfg.image_latent_dim, h, w))

        text2 = jnp.concatenate([text_tokens, text_tokens], axis=0)
        mp2 = jnp.concatenate([mp, mp], axis=0)
        L = text2.shape[1]
        bias = omni_attn_mask(mp2, L)

        def drift(x_last, t):
            # x_last: [2, C, h, w] (cond/uncond copies of the last image)
            lat = jnp.concatenate([history_latents, x_last[:1]], axis=0)
            lat2 = jnp.concatenate([lat, lat], axis=0)  # cond + uncond
            t_per_img = jnp.concatenate(
                [jnp.ones((M - 1,)), t[:1]]) if M > 1 else t[:1]
            t_full = jnp.concatenate([t_per_img, t_per_img], axis=0)
            v = showo2_t2i_velocity(
                cfg, params, text2, lat2, t_full, bias, mp2,
                guidance_scale=self.guidance_scale,
                only_denoise_last_image=True)
            # v: [2*M, C, h, w]; take last image of each half
            return jnp.stack([v[M - 1], v[2 * M - 1]], axis=0)

        grid = ode_timegrid(self.num_steps,
                            time_shifting_factor=self.time_shifting_factor)
        z2 = jnp.concatenate([z_new, z_new], axis=0)
        out = sample_ode_euler(drift, z2, grid)
        return out[:1]

    def generate(self, prompt: str, key, num_rounds: int = 2
                 ) -> Tuple[List[List[int]], np.ndarray]:
        """Alternate text/image generation.  Returns (text-token rounds,
        decoded images [N, H, W, 3])."""
        ids = self.token_ids
        cfg = self.cfg
        n_img = cfg.num_image_tokens

        tokens: List[int] = [ids["bos_id"]] + self._tok(prompt)
        history = jnp.zeros((0, cfg.image_latent_dim,
                             cfg.image_latent_height, cfg.image_latent_width))
        text_rounds: List[List[int]] = []
        mp_list: List[Tuple[int, int]] = []

        for _ in range(num_rounds):
            key, k_lm, k_img = jax.random.split(key, 3)
            new_text = self.lm_generate(tokens, k_lm)
            text_rounds.append(new_text)
            tokens = tokens + new_text
            if not new_text or new_text[-1] == ids["eos_id"]:
                break
            if new_text[-1] != ids["boi_id"]:
                tokens.append(ids["boi_id"])
            # image span: [boi already in tokens][img_pad x n][eoi]
            offset = len(tokens)
            tokens += [ids["img_pad_id"]] * n_img + [ids["eoi_id"]]
            mp_list.append((offset, n_img))

            mp = jnp.asarray([mp_list])
            text_arr = jnp.asarray(tokens)[None]
            z = self._denoise_last(text_arr, mp, history, k_img)
            history = jnp.concatenate([history, z], axis=0)

        if history.shape[0]:
            imgs = wan_decode(self.vae_cfg, self.vae_params,
                              history[:, :, None])
            imgs = np.asarray(jnp.transpose(imgs[:, :, 0], (0, 2, 3, 1)))
        else:
            imgs = np.zeros((0, 1, 1, 3), np.float32)
        return text_rounds, imgs
