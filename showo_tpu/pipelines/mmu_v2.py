"""Show-o2 multimodal understanding pipeline (VQA over VAE latents).

Ports show-o2/inference_mmu.py:95-170: image -> VAE latent -> dual-path
embed with t=1.0 (clean image), qwen chat scaffolding
``[bos]system...[im_end]\\n[im_start]user\\n[boi][t][img x N][eoi]question
\\n[im_start]assistant\\n``, v2 omni mask, AR decode — here with a KV
cache instead of the reference's full re-forward per token.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.sampling.ar import ar_generate
from showo_tpu.show_o2.dit import time_embed_apply
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward
from showo_tpu.show_o2.showo2 import Showo2Config, embed_images
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_encode


@dataclasses.dataclass
class MMUV2Pipeline:
    cfg: Showo2Config
    params: dict
    vae_cfg: WanVAEConfig
    vae_params: dict
    tokenizer: object
    token_ids: dict
    max_new_tokens: int = 300
    top_k: Optional[int] = 1
    top_p: Optional[float] = None
    temperature: float = 1.0
    fuse_weights: bool = True  # qkv + gate/up wide-matmul fusions
    quantize_int8: bool = False  # weight-only int8 serving (+72% tok/s)

    def __post_init__(self):
        if self.fuse_weights:
            from showo_tpu.show_o2.showo2 import fuse_inference

            self.params = fuse_inference(self.params)
        if self.quantize_int8:
            from showo_tpu.show_o2.qwen2 import quantize_int8 as _q8

            self.params = dict(self.params,
                               showo=jax.jit(_q8)(self.params["showo"]))

    @property
    def resolution(self) -> int:
        """Input image resolution (the eval sweep's transform size)."""
        return int(self.cfg.image_latent_height * 8)

    def decode(self, toks) -> str:
        """Token ids -> text (the eval sweep's prediction string)."""
        try:
            return self.tokenizer.decode(list(toks),
                                         skip_special_tokens=True)
        except (AttributeError, TypeError):
            return str(list(toks))

    def _tok(self, text: str) -> List[int]:
        ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        return list(ids)

    def answer(self, image_nhwc: np.ndarray, question: str, key,
               system_prompt: str = "system\nYou are a helpful assistant.") -> List[int]:
        ids = self.token_ids

        pixels = jnp.transpose(jnp.asarray(image_nhwc)[None], (0, 3, 1, 2))[:, :, None]
        sys_ids = self._tok(system_prompt)
        role_a = self._tok("\nuser\n")
        role_b = self._tok("\nassistant\n")
        q_ids = self._tok(question)
        tokens_a = jnp.asarray([[ids["bos_id"]] + sys_ids + role_a])
        tokens_b = jnp.asarray([[ids["boi_id"], ids["eoi_id"]] + q_ids + role_b])
        toks, valid = self._answer_core(self.params, self.vae_params,
                                        pixels, tokens_a, tokens_b, key)
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        eos = ids["eos_id"]
        return [t for t in toks[valid].tolist() if t != eos]

    def _answer_core(self, params, vae_params, pixels, tokens_a, tokens_b,
                     key):
        """One jitted VAE-encode → embed → prefill → AR-decode program
        (cached by prompt shape: repeated eval-sweep calls with the same
        question length no longer re-trace the 28-layer scans)."""
        if not hasattr(self, "_core_jit"):
            self._core_jit = jax.jit(self._answer_core_impl)
        return self._core_jit(params, vae_params, pixels, tokens_a,
                              tokens_b, key)

    def _answer_core_impl(self, params, vae_params, pixels, tokens_a,
                          tokens_b, key):
        cfg, ids = self.cfg, self.token_ids
        key, k_vae = jax.random.split(key)
        latents = wan_encode(self.vae_cfg, vae_params, pixels, k_vae)[:, :, 0]
        image_embeds = embed_images(cfg, params, latents)

        embed = params["showo"]["embed"]
        emb_a = embed[tokens_a]
        emb_b = embed[tokens_b]

        dtype = emb_a.dtype
        t1 = jnp.ones((1,), jnp.float32)
        time_embeds = time_embed_apply(params["time_embed"], t1, dtype)
        if "time_embed_proj" in params:
            tp = params["time_embed_proj"]
            time_embeds = time_embeds @ tp["kernel"] + tp["bias"]

        n_img = cfg.num_image_tokens  # incl. time slot
        input_embeds = jnp.concatenate([
            emb_a, emb_b[:, :1], time_embeds[:, None, :],
            image_embeds, emb_b[:, 1:]], axis=1)
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
            emb = embed[tok_ids]
            logits, _, cache = qwen2_forward(llm, params["showo"],
                                             input_embeds=emb,
                                             attention_bias=b, cache=cache)
            return logits, cache

        return ar_generate(
            prefill, decode, jnp.zeros((B, S), jnp.int32), key,
            max_new_tokens=self.max_new_tokens, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p, eot_token=ids["eos_id"],
            prompt_bias=bias)
