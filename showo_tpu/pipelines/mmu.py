"""Show-o v1 multimodal-understanding pipeline (VQA/captioning).

Ports inference_mmu.py:86-187: discrete path (option a — VQ tokens) and
CLIP-ViT path (option c — continuous features spliced as embeddings), both
decoding with the compiled KV-cache AR loop.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import (
    ShowoConfig,
    mm_project,
    showo_forward,
    showo_mmu_generate,
)
from showo_tpu.models.phi import KVCache
from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_mmu_vit
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.sampling.ar import ar_generate


@dataclasses.dataclass
class MMUPipeline:
    cfg: ShowoConfig
    params: dict
    vq_cfg: VQConfig
    vq_params: dict
    uni_prompting: UniversalPrompting
    max_new_tokens: int = 100
    top_k: Optional[int] = 1
    top_p: Optional[float] = None
    temperature: float = 1.0
    param_fusion: str = "mlp"  # "mlp" | "qkv" | "none" (exact parity)
    quantize_int8: bool = False  # weight-only int8 serving (+65% tok/s)

    def __post_init__(self):
        self._vq = MagvitV2(self.vq_cfg)

        # see T2IPipeline.param_fusion — same inference-only weight
        # re-layout; the AR KV-cache decode hits the identical fused layer
        if self.param_fusion == "mlp":
            from showo_tpu.models.phi import fuse_parallel_mlp
            self.params = dict(self.params,
                               showo=fuse_parallel_mlp(self.params["showo"]))
        elif self.param_fusion == "qkv":
            from showo_tpu.models.phi import fuse_qkv
            self.params = dict(self.params,
                               showo=fuse_qkv(self.params["showo"]))
        if self.quantize_int8:
            from showo_tpu.models.phi import quantize_int8 as _q8
            self.params = dict(self.params,
                               showo=jax.jit(_q8)(self.params["showo"]))

        @jax.jit
        def _encode(vq_params, pixels):
            return self._vq.apply({"params": vq_params}, pixels,
                                  method=self._vq.get_code)

        self._encode = _encode

    def decode(self, toks) -> str:
        """Token ids -> text (the eval sweep's prediction string)."""
        try:
            return self.uni_prompting.text_tokenizer.batch_decode(
                [list(toks)], skip_special_tokens=True)[0]
        except AttributeError:
            return str(list(toks))

    def answer(self, image_nhwc: np.ndarray, question: str, key) -> List[int]:
        """Discrete path: [mmu][soi]img[eoi][sot]USER: ...ASSISTANT: ->
        sampled token ids up to eot."""
        sp = self.uni_prompting.sptids
        tokens = np.asarray(self._encode(
            self.vq_params, jnp.asarray(image_nhwc)[None]))
        tokens = tokens + self.cfg.codebook_offset

        q_ids = self.uni_prompting.text_tokenizer(
            ["USER: \n" + question + " ASSISTANT:"])["input_ids"][0]
        prompt = np.concatenate([
            [sp["<|mmu|>"], sp["<|soi|>"]], tokens[0],
            [sp["<|eoi|>"], sp["<|sot|>"]], np.asarray(q_ids, np.int64)])
        prompt = jnp.asarray(prompt)[None]

        bias = omni_mask_mmu(prompt, eoi_id=sp["<|eoi|>"])
        toks, valid = showo_mmu_generate(
            self.cfg, self.params, prompt, key, prompt_bias=bias,
            max_new_tokens=self.max_new_tokens, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p, eot_token=sp["<|eot|>"])
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        out = toks[valid].tolist()
        eot = sp["<|eot|>"]
        return [t for t in out if t != eot]

    def answer_with_clip(self, clip_features: np.ndarray, question: str,
                         system_prompt_ids: np.ndarray, key,
                         conversation_prompt: Optional[str] = None) -> List[int]:
        """CLIP-ViT path (w_clip_vit): continuous features projected by
        mm_projector spliced after [mmu][system][soi] (inference_mmu.py:100-151)."""
        sp = self.uni_prompting.sptids
        text = conversation_prompt if conversation_prompt is not None else (
            "USER: " + question + " ASSISTANT:")
        q_ids = self.uni_prompting.text_tokenizer([text])["input_ids"][0]
        sys_len = len(system_prompt_ids)

        ids = np.concatenate([
            [sp["<|mmu|>"]], np.asarray(system_prompt_ids, np.int64),
            [sp["<|soi|>"], sp["<|eoi|>"]], np.asarray(q_ids, np.int64)])
        ids = jnp.asarray(ids)[None]

        embeds = self.params["showo"]["embed"][ids]
        feats = mm_project(self.params, jnp.asarray(clip_features)[None])
        part1 = embeds[:, :2 + sys_len]
        part2 = embeds[:, 2 + sys_len:]
        input_embeds = jnp.concatenate([part1, feats, part2], axis=1)

        B, S, _ = input_embeds.shape
        bias = omni_mask_mmu_vit(B, S, system_prompt_len=sys_len,
                                 num_patches=feats.shape[1])

        cap = S + self.max_new_tokens
        cfg, params = self.cfg, self.params

        def prefill(embeds_in, pb):
            cache = KVCache.zeros(cfg.llm, B, cap,
                                  dtype=params["showo"]["embed"].dtype)
            pad = cap - pb.shape[-1]
            pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 0), (0, pad)),
                         constant_values=-1e9)
            return showo_forward(cfg, params, input_embeds=embeds_in,
                                 attention_bias=pb, cache=cache)

        def decode(tok_ids, b, cache):
            emb = params["showo"]["embed"][tok_ids]
            return showo_forward(cfg, params, input_embeds=emb,
                                 attention_bias=b, cache=cache)

        # ar_generate expects prompt ids for shape only; feed embeddings
        # through closures
        def prefill_ids(_ids, pb):
            return prefill(input_embeds, pb)

        eot = sp["<|eot|>"]
        toks, valid = ar_generate(
            prefill_ids, decode, jnp.zeros((B, S), jnp.int32), key,
            max_new_tokens=self.max_new_tokens, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p, eot_token=eot,
            prompt_bias=bias)
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        return [t for t in toks[valid].tolist() if t != eot]
