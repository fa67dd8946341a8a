"""Show-o2 video understanding pipeline (inference_mmu_vid.py equivalent).

Uniform-sampled frames -> Wan VAE video latents -> per-frame und / joint
gen embedding -> qwen chat scaffold -> KV-cached AR decode.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.pipelines.mmu_v2 import MMUV2Pipeline
from showo_tpu.show_o2.showo2 import embed_images
from showo_tpu.show_o2.wan_vae import wan_encode


@dataclasses.dataclass
class MMUVidPipeline(MMUV2Pipeline):
    num_frames: int = 9

    def answer_video(self, frames_thwc: np.ndarray, question: str, key,
                     system_prompt: str = "system\nYou are a helpful assistant.") -> List[int]:
        """frames: [T, H, W, 3] in [-1, 1]."""
        cfg, params, ids = self.cfg, self.params, self.token_ids
        # [T,H,W,C] -> [1, 3, T, H, W]
        pixels = jnp.transpose(jnp.asarray(frames_thwc), (3, 0, 1, 2))[None]
        key, k_vae = jax.random.split(key)
        latents = wan_encode(self.vae_cfg, self.vae_params, pixels, k_vae)
        # latents [1, C, T', h, w]; video embedding path
        image_embeds = embed_images(cfg, params, latents)

        n_latent_frames = latents.shape[2]
        per_frame = ((cfg.image_latent_height // cfg.patch_size)
                     * (cfg.image_latent_width // cfg.patch_size))
        n_vid = n_latent_frames * per_frame + (1 if cfg.add_time_embeds else 0)
        return self._decode_with_embeds(image_embeds, n_vid, question, key,
                                        system_prompt)

    def _decode_with_embeds(self, image_embeds, n_img, question, key,
                            system_prompt):
        from showo_tpu.sampling.ar import ar_generate
        from showo_tpu.show_o2.dit import time_embed_apply
        from showo_tpu.show_o2.masks import omni_attn_mask
        from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward

        cfg, params, ids = self.cfg, self.params, self.token_ids
        sys_ids = self._tok(system_prompt)
        role_a = self._tok("\nuser\n")
        role_b = self._tok("\nassistant\n")
        q_ids = self._tok(question)

        tokens_a = jnp.asarray([[ids["bos_id"]] + sys_ids + role_a])
        tokens_b = jnp.asarray([[ids["boi_id"], ids["eoi_id"]] + q_ids + role_b])
        embed = params["showo"]["embed"]
        emb_a, emb_b = embed[tokens_a], embed[tokens_b]

        dtype = emb_a.dtype
        time_embeds = time_embed_apply(params["time_embed"],
                                       jnp.ones((1,), jnp.float32), dtype)
        if "time_embed_proj" in params:
            tp = params["time_embed_proj"]
            time_embeds = time_embeds @ tp["kernel"] + tp["bias"]

        input_embeds = jnp.concatenate(
            [emb_a, emb_b[:, :1], time_embeds[:, None, :], image_embeds,
             emb_b[:, 1:]], axis=1)
        mp = jnp.asarray([[[tokens_a.shape[1] + 2, n_img]]])
        B, S, _ = input_embeds.shape
        bias = omni_attn_mask(mp[:, 0][:, None, :].reshape(1, 1, 2), S)
        cap = S + self.max_new_tokens
        llm = cfg.llm

        def prefill(_ids, pb):
            cache = Qwen2KVCache.zeros(llm, B, cap, dtype=embed.dtype)
            pad = cap - pb.shape[-1]
            pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 0), (0, pad)),
                         constant_values=-1e9)
            logits, _, cache = qwen2_forward(llm, params["showo"],
                                             input_embeds=input_embeds,
                                             attention_bias=pb, cache=cache)
            return logits, cache

        def decode(tok_ids, b, cache):
            logits, _, cache = qwen2_forward(llm, params["showo"],
                                             input_embeds=embed[tok_ids],
                                             attention_bias=b, cache=cache)
            return logits, cache

        eos = ids["eos_id"]
        toks, valid = ar_generate(
            prefill, decode, jnp.zeros((B, S), jnp.int32), key,
            max_new_tokens=self.max_new_tokens, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p, eot_token=eos,
            prompt_bias=bias)
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        return [t for t in toks[valid].tolist() if t != eos]
