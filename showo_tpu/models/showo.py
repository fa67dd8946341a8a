"""Show-o unified model: one Phi forward serving t2i / lm / mmu.

Parity with models/modeling_showo.py: the fused batch is laid out
``[t2i | lm | mmu]`` and a single forward produces three losses —
masked-token CE over image positions (t2i), next-token CE (lm, mmu)
(modeling_showo.py:59-102).  Generation entry points live in
showo_tpu.sampling and are wired here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import KVCache, PhiConfig, init_phi_params, phi_forward
from showo_tpu.sampling.ar import ar_generate
from showo_tpu.sampling.maskgit import maskgit_generate
from showo_tpu.sampling.schedules import cosine_schedule


@dataclasses.dataclass(frozen=True)
class ShowoConfig:
    vocab_size: int = 58498
    llm_vocab_size: int = 50295
    num_new_special_tokens: int = 10
    codebook_size: int = 8192
    num_vq_tokens: int = 256
    w_clip_vit: bool = False
    # mm_projector input width: CLIP-L hidden (modeling_showo.py:49-54);
    # 1024*len(scales) when the S2 multiscale tower feeds it
    clip_feat_dim: int = 1024
    llm: PhiConfig = dataclasses.field(default_factory=PhiConfig)

    @property
    def mask_token_id(self) -> int:
        return self.vocab_size - 1

    @property
    def codebook_offset(self) -> int:
        return self.llm_vocab_size + self.num_new_special_tokens


def init_showo_params(cfg: ShowoConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    params = {"showo": init_phi_params(cfg.llm, key, dtype)}
    if cfg.w_clip_vit:
        k1, k2 = jax.random.split(key)
        d = cfg.llm.hidden_size
        params["mm_projector"] = {
            "fc1": {"kernel": (jax.random.normal(k1, (cfg.clip_feat_dim, d)) * 0.02).astype(dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "fc2": {"kernel": (jax.random.normal(k2, (d, d)) * 0.02).astype(dtype),
                    "bias": jnp.zeros((d,), dtype)},
        }
    return params


def mm_project(params: Dict[str, Any], feats: jnp.ndarray) -> jnp.ndarray:
    """1024 -> 2048 -> 2048 MLP over CLIP features (modeling_showo.py:49-54)."""
    p = params["mm_projector"]
    h = feats @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def cross_entropy_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                         ignore_id: int = -100) -> jnp.ndarray:
    """Mean CE over positions where labels != ignore_id (F.cross_entropy).

    logsumexp form: ``nll = lse(x) - x[label]`` instead of materializing
    the full [B, S, V] fp32 log_softmax output (2.6 GB at the v1 train
    recipe) just to gather one column per row — the two reductions fuse
    over the logits read and only [B, S] scalars are written.  Same
    max-stabilization as log_softmax (eps-level float differences only).
    """
    valid = labels != ignore_id
    safe = jnp.where(valid, labels, 0)
    x = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    picked = jnp.take_along_axis(x, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def showo_forward(
    cfg: ShowoConfig,
    params: Dict[str, Any],
    input_ids: Optional[jnp.ndarray] = None,
    input_embeds: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    remat: bool = False,
    attn_meta=None,
):
    return phi_forward(cfg.llm, params["showo"], input_ids=input_ids,
                       input_embeds=input_embeds, attention_bias=attention_bias,
                       cache=cache, remat=remat, attn_meta=attn_meta)


def showo_losses(
    cfg: ShowoConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    labels: jnp.ndarray,
    attention_bias: jnp.ndarray,
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
    max_seq_length: int = 128,
    remat: bool = True,
    input_embeds=None,
    attn_meta=None,
):
    """Fused 3-task forward (modeling_showo.py:59-102).

    Returns (logits, loss_t2i, loss_lm, loss_mmu).  max_seq_length is the
    text-prefix length of the t2i layout (slicing at max_seq_length+1).
    input_embeds replaces input_ids for the w_clip_vit continuous path.
    attn_meta routes attention through the Pallas kernels (e.g.
    "pallas_trainable" for the flash custom-VJP training path).
    """
    logits, _ = showo_forward(cfg, params, input_ids=input_ids,
                              input_embeds=input_embeds,
                              attention_bias=attention_bias, remat=remat,
                              attn_meta=attn_meta)
    t2i_end = batch_size_t2i
    lm_end = batch_size_t2i + batch_size_lm

    loss_t2i = cross_entropy_ignore(
        logits[:t2i_end, max_seq_length + 1:],
        labels[:t2i_end, max_seq_length + 1:])
    loss_lm = cross_entropy_ignore(
        logits[t2i_end:lm_end, :-1], labels[t2i_end:lm_end, 1:])
    loss_mmu = cross_entropy_ignore(
        logits[lm_end:lm_end + batch_size_mmu, :-1],
        labels[lm_end:lm_end + batch_size_mmu, 1:])
    return logits, loss_t2i, loss_lm, loss_mmu


def showo_t2i_generate(
    cfg: ShowoConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    key: jax.Array,
    *,
    uncond_input_ids: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    temperature: float = 1.0,
    timesteps: int = 18,
    noise_schedule=cosine_schedule,
    max_seq_length: int = 128,
    injected_noise=None,
    use_pallas_attention: bool = False,
    pad_id: int = 50295,
    soi_id: int = 50296,
    eoi_id: int = 50297,
    sliced_head: bool = True,
):
    """MaskGIT generation (modeling_showo.py:104-181) as a compiled loop.

    use_pallas_attention routes attention through the fused omni kernel;
    the span metadata is computed once from the initial layout (special
    tokens and pads never move during MaskGIT denoising).
    """
    attn_meta = None
    if use_pallas_attention:
        from showo_tpu.ops.flash_attention import metadata_predict_next

        impl = (use_pallas_attention if isinstance(use_pallas_attention, str)
                else "pallas")
        meta_ids = (jnp.concatenate([input_ids, uncond_input_ids], axis=0)
                    if uncond_input_ids is not None and guidance_scale > 0
                    else input_ids)
        attn_meta = (impl,) + metadata_predict_next(meta_ids, pad_id, soi_id,
                                                    eoi_id)

    L = input_ids.shape[1]
    head_slice = None
    if sliced_head:
        # only image rows x codebook columns are sampled from — skip the
        # rest of the unified-vocab head matmul (~14x smaller)
        head_slice = (L - cfg.num_vq_tokens - 1, L - 1,
                      cfg.codebook_offset,
                      cfg.codebook_offset + cfg.codebook_size)

    def forward_fn(ids):
        logits, _ = phi_forward(cfg.llm, params["showo"], input_ids=ids,
                                attention_bias=attention_bias,
                                attn_meta=attn_meta,
                                lm_head_slice=head_slice)
        return logits

    return maskgit_generate(
        forward_fn, input_ids, key,
        forward_returns_sliced=sliced_head,
        uncond_input_ids=uncond_input_ids,
        num_vq_tokens=cfg.num_vq_tokens,
        mask_token_id=cfg.mask_token_id,
        codebook_offset=cfg.codebook_offset,
        codebook_size=cfg.codebook_size,
        prompt_len=max_seq_length + 1,
        timesteps=timesteps,
        guidance_scale=guidance_scale,
        temperature=temperature,
        noise_schedule=noise_schedule,
        injected_noise=injected_noise,
    )


def showo_t2i_generate_cached(
    cfg: ShowoConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    key: jax.Array,
    *,
    uncond_input_ids: Optional[jnp.ndarray] = None,
    attention_bias: jnp.ndarray,
    guidance_scale: float = 0.0,
    temperature: float = 1.0,
    timesteps: int = 18,
    noise_schedule=cosine_schedule,
    max_seq_length: int = 128,
    injected_noise=None,
    use_pallas_attention: bool = False,
    pad_id: int = 50295,
    soi_id: int = 50296,
    eoi_id: int = 50297,
):
    """MaskGIT generation with a prefix KV cache.

    The text prefix (pads + task + text, positions < max_seq_length+1) is
    constant across denoise steps and its keys/values only depend on
    itself, so it is prefilled ONCE; each step re-forwards only the
    soi..eoi image span (S: 387 -> 258 rows at 256^2) attending to the
    cached prefix.  Bit-identical outputs to showo_t2i_generate — pure
    compute reuse, no approximation.
    """
    from showo_tpu.sampling.maskgit import maskgit_generate

    B, L = input_ids.shape
    P = max_seq_length + 1          # prefix length
    Q = L - P                       # soi + image + eoi rows
    use_cfg = uncond_input_ids is not None and guidance_scale > 0
    if use_cfg:
        full_prefix = jnp.concatenate(
            [input_ids[:, :P], uncond_input_ids[:, :P]], axis=0)
    else:
        full_prefix = input_ids[:, :P]
    Bf = full_prefix.shape[0]

    attn_meta = None
    if use_pallas_attention:
        from showo_tpu.ops.flash_attention import metadata_predict_next

        impl = (use_pallas_attention if isinstance(use_pallas_attention, str)
                else "pallas")
        meta_ids = (jnp.concatenate([input_ids, uncond_input_ids], axis=0)
                    if use_cfg else input_ids)
        attn_meta = (impl,) + metadata_predict_next(meta_ids, pad_id, soi_id,
                                                    eoi_id)

    # prefill the prefix rows once
    cache = KVCache.zeros(cfg.llm, Bf, L, dtype=params["showo"]["embed"].dtype)
    prefix_bias = attention_bias[:, :, :P, :]
    _, cache = showo_forward(cfg, params, input_ids=full_prefix,
                             attention_bias=prefix_bias, cache=cache)
    cache = KVCache(cache.k, cache.v, jnp.asarray(P, jnp.int32))

    step_bias = attention_bias[:, :, P:, :]
    head_slice = (1, 1 + cfg.num_vq_tokens,   # img rows within the Q slice
                  cfg.codebook_offset,
                  cfg.codebook_offset + cfg.codebook_size)

    def forward_fn(ids):
        # static_prefix_len: the prefix K/V are loop-invariant inside the
        # sampling scan, so the decode concatenates fresh image-span K/V
        # after a static prefix slice instead of dynamic_update_slice into
        # the full cache (which would copy the whole buffer per layer per
        # step — ~1.2 GB/step at 256^2)
        logits, _ = phi_forward(cfg.llm, params["showo"],
                                input_ids=ids[:, P:],
                                attention_bias=step_bias, cache=cache,
                                lm_head_slice=head_slice,
                                attn_meta=attn_meta,
                                static_prefix_len=P)
        return logits

    return maskgit_generate(
        forward_fn, input_ids, key,
        forward_returns_sliced=True,
        uncond_input_ids=uncond_input_ids,
        num_vq_tokens=cfg.num_vq_tokens,
        mask_token_id=cfg.mask_token_id,
        codebook_offset=cfg.codebook_offset,
        codebook_size=cfg.codebook_size,
        prompt_len=P,
        timesteps=timesteps,
        guidance_scale=guidance_scale,
        temperature=temperature,
        noise_schedule=noise_schedule,
        injected_noise=injected_noise,
    )


def showo_mmu_generate(
    cfg: ShowoConfig,
    params: Dict[str, Any],
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    *,
    prompt_bias: jnp.ndarray,
    max_new_tokens: int = 100,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eot_token: Optional[int] = None,
    cache_len: Optional[int] = None,
    injected_gumbel=None,
):
    """AR decode with KV cache (vs. cacheless modeling_showo.py:183-240)."""
    B, S = prompt_ids.shape
    cap = cache_len or (S + max_new_tokens)

    def prefill(ids, bias):
        cache = KVCache.zeros(cfg.llm, B, cap, dtype=params["showo"]["embed"].dtype)
        # bias over the cache capacity: pad key axis to cap
        pad = cap - bias.shape[-1]
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad)),
                       constant_values=-1e9)
        return showo_forward(cfg, params, input_ids=ids, attention_bias=bias,
                             cache=cache)

    def decode(ids, bias, cache):
        return showo_forward(cfg, params, input_ids=ids, attention_bias=bias,
                             cache=cache)

    return ar_generate(prefill, decode, prompt_ids, key,
                       max_new_tokens=max_new_tokens, temperature=temperature,
                       top_k=top_k, top_p=top_p, eot_token=eot_token,
                       prompt_bias=prompt_bias,
                       injected_gumbel=injected_gumbel)
