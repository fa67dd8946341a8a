"""Show-o2 unified model (Qwen2.5 LLM + flow-matching DiT head), TPU-native.

Parity with show-o2/models/modeling_showo2_qwen2_5.py:
  * dual-path visual embedding: PatchEmbed->SigLIP semantic layers (und)
    and PatchEmbed->LLM-dim (gen), fused by RMSNorm+MLP ``fusion_proj``
    (:63-90, 288-326);
  * time-embed token + per-image embeddings scattered into text slots by
    ``modality_positions`` — vectorized here (:350-371);
  * Qwen2 forward with the raw 4D omni mask, then a 10-layer DiT head with
    adaLN-by-span and a zero-init FinalLayer producing the velocity
    (:373-393);
  * losses: next-token CE over text labels + masked MSE over velocity
    (:396-407, misc.py:11-21);
  * inference extraction with the reference's exact patchify/unpatchify
    reshape pair (:145-158, 410-433) and CFG zeroing rules (:436-465).

Latents follow the reference's NCHW at the interface; convs run NHWC
internally (TPU native).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from showo_tpu.show_o2.dit import (
    DiffusionHeadConfig,
    dit_forward,
    final_layer_apply,
    init_dit_params,
    init_final_layer_params,
    patch_embed_apply,
    time_embed_apply,
)
from showo_tpu.show_o2.masks import modality_gather, modality_scatter
from showo_tpu.show_o2.qwen2 import Qwen2Config, Qwen2KVCache, init_qwen2_params, qwen2_forward
from showo_tpu.show_o2.siglip import (
    SigLipConfig,
    init_siglip_params,
    interpolate_pos_encoding,
    siglip_encode,
)


@dataclasses.dataclass(frozen=True)
class Showo2Config:
    llm: Qwen2Config = dataclasses.field(default_factory=Qwen2Config)
    siglip: SigLipConfig = dataclasses.field(default_factory=SigLipConfig)
    dit: DiffusionHeadConfig = dataclasses.field(default_factory=DiffusionHeadConfig)
    image_latent_dim: int = 16
    image_latent_height: int = 54   # 432px / 8 VAE downsample
    image_latent_width: int = 54    # -> 27x27 = 729 patches (+1 time token)
    patch_size: int = 2
    clip_latent_dim: int = 1152
    add_time_embeds: bool = True

    @property
    def num_image_tokens(self) -> int:
        n = (self.image_latent_height // self.patch_size) * \
            (self.image_latent_width // self.patch_size)
        return n + (1 if self.add_time_embeds else 0)


def init_showo2_params(cfg: Showo2Config, key, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    D_llm = cfg.llm.hidden_size
    D_clip = cfg.clip_latent_dim
    D_dit = cfg.dit.hidden_size
    p, C = cfg.patch_size, cfg.image_latent_dim
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    params = {
        "showo": init_qwen2_params(cfg.llm, ks[0], dtype),
        "image_embedder_und": {"kernel": n(ks[1], (p, p, C, D_clip)),
                               "bias": z((D_clip,))},
        "image_embedder_gen": {"kernel": n(ks[2], (p, p, C, D_llm)),
                               "bias": z((D_llm,))},
        "und_trans": init_siglip_params(cfg.siglip, ks[3], dtype),
        "fusion_proj": {
            "norm": {"scale": jnp.ones((D_clip + D_llm,), dtype)},
            "fc1": {"kernel": n(ks[4], (D_clip + D_llm, D_llm)), "bias": z((D_llm,))},
            "fc2": {"kernel": n(ks[5], (D_llm, D_llm)), "bias": z((D_llm,))},
        },
        "time_embed": {
            "fc1": {"kernel": n(ks[6], (256, D_dit)), "bias": z((D_dit,))},
            "fc2": {"kernel": n(ks[7], (D_dit, D_dit)), "bias": z((D_dit,))},
        },
        "diffusion_head_a": init_dit_params(cfg.dit, ks[8], dtype),
        "diffusion_head_b": init_final_layer_params(D_dit, p, C, ks[9], dtype),
    }
    if D_llm != D_dit:
        params["diff_proj"] = {
            "fc1": {"kernel": n(ks[10], (D_llm, D_dit)), "bias": z((D_dit,))},
            "fc2": {"kernel": n(ks[11], (D_dit, D_dit)), "bias": z((D_dit,))},
        }
        params["time_embed_proj"] = {"kernel": n(ks[11], (D_dit, D_llm)),
                                     "bias": z((D_llm,))}
    return params


def fuse_inference(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inference weight fusions for the whole Showo2 model: Qwen2 qkv +
    gate/up and DiT qkv + gate/up collapse into wide matmuls (numerically
    identical; the v2 analog of the v1 fuse_parallel_mlp pass, VERDICT r2
    item 2).  Idempotent."""
    from showo_tpu.show_o2 import dit as _dit
    from showo_tpu.show_o2 import qwen2 as _qwen2

    out = dict(params)
    out["showo"] = _qwen2.fuse_inference(params["showo"])
    out["diffusion_head_a"] = _dit.fuse_inference(params["diffusion_head_a"])
    return out


def _rms_norm_affine(x, scale, eps=1e-6):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (scale * (x32 * jax.lax.rsqrt(var + eps))).astype(dt)


def embed_images(cfg: Showo2Config, params, latents_nchw: jnp.ndarray,
                 remat: bool = False):
    """Dual-path embedding + fusion.

    Image latents [B, C, H, W] -> [B, N, D_llm], N = (H/p)(W/p).
    Video latents [B, C, T, H, W] -> [B, T*N, D_llm]: the und path runs
    SigLIP per frame, the gen path embeds jointly over (t l)
    (modeling_showo2_qwen2_5.py:188-198, 292-302).
    """
    is_video = latents_nchw.ndim == 5
    if is_video:
        B, C, T, H, W = latents_nchw.shape
        x = jnp.transpose(latents_nchw, (0, 2, 3, 4, 1)).reshape(
            B * T, H, W, C)  # (b t) h w c
    else:
        x = jnp.transpose(latents_nchw, (0, 2, 3, 1))  # NHWC
    # serving boundary: the VAE may run fp32 while the model is bf16
    x = x.astype(params["image_embedder_und"]["kernel"].dtype)
    und = patch_embed_apply(params["image_embedder_und"], x, cfg.patch_size)
    gen = patch_embed_apply(params["image_embedder_gen"], x, cfg.patch_size)

    h_, w_ = x.shape[1] // cfg.patch_size, x.shape[2] // cfg.patch_size
    pos = params["und_trans"]["pos_embed"]
    if pos.shape[0] == h_ * w_:
        und = und + pos[None]
    else:
        und = und + interpolate_pos_encoding(pos, h_, w_)
    # remat matters under grad: without it the 26-layer scan saves every
    # layer's fp32 [B,H,S,S] softmax probs (~2.6 GB at B=2/S=729 — the
    # dominant stage-1 allocation by far)
    und = siglip_encode(cfg.siglip, params["und_trans"], und, remat=remat)

    fused = jnp.concatenate([und, gen], axis=-1)
    fp = params["fusion_proj"]
    fused = _rms_norm_affine(fused, fp["norm"]["scale"])
    fused = fused @ fp["fc1"]["kernel"] + fp["fc1"]["bias"]
    fused = jax.nn.gelu(fused, approximate=False)
    fused = fused @ fp["fc2"]["kernel"] + fp["fc2"]["bias"]
    if is_video:
        return fused.reshape(B, T * fused.shape[1], fused.shape[-1])
    return fused


def patchify_labels(cfg: Showo2Config, labels_nchw: jnp.ndarray):
    """Reference label 'patchify' — the exact reshape chain at
    modeling_showo2_qwen2_5.py:329-337 (a pure reshape, not a spatial
    patch extraction; its inverse is unpatchify below).  Accepts image
    [B, C, H, W] or video [B, C, T, H, W] labels."""
    p = cfg.patch_size
    if labels_nchw.ndim == 5:
        b, c, T, H, W = labels_nchw.shape
        h_, w_ = H // p, W // p
        x = jnp.transpose(labels_nchw.reshape(b, c, T * H * W), (0, 2, 1))
        x = x.reshape(b, T, h_, w_, p, p, c)
        return x.reshape(b, T * h_ * w_, p * p * c)
    b, c, H, W = labels_nchw.shape
    h_, w_ = H // p, W // p
    x = jnp.transpose(labels_nchw.reshape(b, c, H * W), (0, 2, 1))  # b (h w) c
    x = x.reshape(b, h_, w_, p, p, c)
    return x.reshape(b, h_ * w_, p * p * c)


def unpatchify_v(cfg: Showo2Config, v: jnp.ndarray, h_: int, w_: int,
                 T: int = 0):
    """(N, L, p^2 C) -> (N, C, H, W) (or (N, C, T, H, W) for video) via the
    mirrored reshape chain (modeling_showo2_qwen2_5.py:145-158, 426-433)."""
    n = v.shape[0]
    p, c = cfg.patch_size, cfg.image_latent_dim
    if T:
        x = v.reshape(n, T, h_, w_, p, p, c).reshape(n, T, h_ * p * w_ * p, c)
        x = jnp.transpose(x, (0, 3, 1, 2))  # b c t l
        return x.reshape(n, c, T, h_ * p, w_ * p)
    x = v.reshape(n, h_, w_, p, p, c).reshape(n, h_ * p * w_ * p, c)
    x = jnp.transpose(x, (0, 2, 1))
    return x.reshape(n, c, h_ * p, w_ * p)


def next_token_prediction_loss(logits, labels, vocab_size):
    """misc.py:11-13.

    Formulated as CE over the FULL logits with left-shifted labels (last
    position ignored) rather than ``logits[:, :-1]`` vs ``labels[:, 1:]``
    — numerically identical (same valid set, same denominator), but the
    slice's backward is a pad on the [B, L, V] cotangent that the SPMD
    partitioner cannot reshard between the batch-sharded loss and the
    vocab-sharded lm_head transpose without an involuntary full
    rematerialization (observed on the dp/fsdp/tp dryrun mesh); shifting
    the (non-differentiated) labels instead leaves no pad in the
    backward at all."""
    from showo_tpu.models.showo import cross_entropy_ignore
    from showo_tpu.parallel.mesh import constrain

    # pin the CE input to the lm_head output's natural sharding (batch
    # over dp, vocab over fsdp/tp) so the backward cotangent already
    # matches the lm_head transpose — without this the partitioner
    # resolves the conflict by replicating the [B, L, V] cotangent
    logits = constrain(logits, "dp", None, ("fsdp", "tp"))
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full_like(labels[:, :1], -100)], axis=1)
    return cross_entropy_ignore(logits, shifted)


def velocity_prediction_loss(v_pred, labels, mask):
    """misc.py:16-21: masked MSE; mask [B, L] over sequence positions."""
    se = jnp.square(v_pred - labels)
    m = mask[:, :, None].astype(bool)
    m = jnp.broadcast_to(m, se.shape)
    total = jnp.where(m, se, 0.0).sum()
    return total / jnp.maximum(m.sum(), 1)


def showo2_forward(
    cfg: Showo2Config,
    params: Dict[str, Any],
    text_tokens: jnp.ndarray,
    image_latents: Optional[jnp.ndarray],      # [B*M, C, H, W] (or None)
    t: Optional[jnp.ndarray],                  # [B*M]
    attention_bias: jnp.ndarray,
    modality_positions: jnp.ndarray,           # [B, M, 2]
    text_labels: Optional[jnp.ndarray] = None,
    image_labels: Optional[jnp.ndarray] = None,  # [B*M, C, H, W] = ut
    image_masks: Optional[jnp.ndarray] = None,   # [B, L]
    und_only: bool = False,
    remat: bool = False,
    attn_meta=None,
):
    """Returns a dict with logits and, depending on label presence,
    loss_ntp / loss_flow / v (sequence-space velocity)."""
    input_embeds = params["showo"]["embed"][text_tokens]
    dtype = input_embeds.dtype
    B, L, D_llm = input_embeds.shape

    if image_latents is None:
        logits, _, _ = qwen2_forward(cfg.llm, params["showo"],
                                     input_ids=text_tokens,
                                     attention_bias=attention_bias,
                                     remat=remat)
        return {"logits": logits}

    image_embeds = embed_images(cfg, params, image_latents.astype(dtype),
                                remat=remat)

    time_embeds = time_embed_apply(params["time_embed"], t, dtype)  # [B*M, D_dit]
    if "time_embed_proj" in params:
        tp = params["time_embed_proj"]
        time_embeds_proj = time_embeds @ tp["kernel"] + tp["bias"]
    else:
        time_embeds_proj = time_embeds

    input_embeds = modality_scatter(input_embeds, image_embeds,
                                    time_embeds_proj, modality_positions,
                                    add_time_embeds=cfg.add_time_embeds)

    logits, last_hidden, _ = qwen2_forward(cfg.llm, params["showo"],
                                           input_embeds=input_embeds,
                                           attention_bias=attention_bias,
                                           remat=remat, attn_meta=attn_meta)
    out = {"logits": logits}
    if text_labels is not None:
        out["loss_ntp"] = next_token_prediction_loss(logits, text_labels,
                                                     cfg.llm.vocab_size)
    if und_only:
        return out

    # diffusion head
    if "diff_proj" in params:
        dp = params["diff_proj"]
        h = last_hidden @ dp["fc1"]["kernel"] + dp["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ dp["fc2"]["kernel"] + dp["fc2"]["bias"]
    else:
        h = last_hidden
    # the DiT head shares the omni mask; route the Pallas kernels into it
    # too.  "pallas_packed" (inference) was dense-only in r1/r2 — at
    # S=986 with H=32 the dense path moves ~250 MB/layer of fp32 scores
    # through HBM, so the packed kernel now routes into the head as well
    dit_meta = (attn_meta if attn_meta is not None
                and isinstance(attn_meta[0], str)
                and attn_meta[0] in ("pallas_trainable", "pallas_streaming",
                                     "pallas_packed")
                else None)
    h = dit_forward(cfg.dit, params["diffusion_head_a"], h, time_embeds,
                    attention_bias, modality_positions, remat=remat,
                    attn_meta=dit_meta)
    v_pred = final_layer_apply(params["diffusion_head_b"], h, time_embeds,
                               modality_positions)  # [B, L, p^2 C]
    out["v_seq"] = v_pred

    if image_labels is not None:
        # scatter patchified labels into sequence positions; mask out the
        # time-embed slot (modeling_showo2_qwen2_5.py:346-365)
        lab = patchify_labels(cfg, image_labels)     # [B*M, N, p^2 C]
        zero_time = jnp.zeros((lab.shape[0], lab.shape[-1]), lab.dtype)
        seq_labels = modality_scatter(
            jnp.zeros_like(v_pred), lab, zero_time, modality_positions,
            add_time_embeds=cfg.add_time_embeds)
        if cfg.add_time_embeds:
            # time slots excluded from the flow loss
            pos = jnp.arange(L)[None, :, None]
            off = modality_positions[:, None, :, 0]
            length = modality_positions[:, None, :, 1]
            is_time = jnp.any((pos == off) & (length > 0), axis=-1)
            image_masks = jnp.where(is_time, 0, image_masks)
        out["loss_flow"] = velocity_prediction_loss(v_pred, seq_labels,
                                                    image_masks)
    return out


def extract_v(cfg: Showo2Config, v_seq: jnp.ndarray,
              modality_positions: jnp.ndarray, h_: int, w_: int,
              num_frames: int = 0):
    """Per-image velocity extraction + unpatchify
    (modeling_showo2_qwen2_5.py:410-433).  Assumes every span is a real
    image (generation-time layout).  Returns [B*M, C, H, W] (or
    [B*M, C, T, H, W] with num_frames > 0)."""
    per_frame = h_ * w_
    span = (max(num_frames, 1) * per_frame
            + (1 if cfg.add_time_embeds else 0))
    spans = modality_gather(v_seq, modality_positions, span)
    if cfg.add_time_embeds:
        spans = spans[:, 1:, :]
    return unpatchify_v(cfg, spans, h_, w_, T=num_frames)


def _dit_meta(attn_meta):
    """Pallas kernels that the DiT head supports (see showo2_forward)."""
    if (attn_meta is not None and isinstance(attn_meta[0], str)
            and attn_meta[0] in ("pallas_trainable", "pallas_streaming",
                                 "pallas_packed")):
        return attn_meta
    return None


def showo2_t2i_prefill(
    cfg: Showo2Config,
    params: Dict[str, Any],
    text_tokens: jnp.ndarray,
    attention_bias: jnp.ndarray,
    modality_positions: jnp.ndarray,
    attn_meta=None,
):
    """Capture the latent-INDEPENDENT per-layer K/V of the full sequence,
    once per generation (the v2 analog of the v1 prefix-KV MaskGIT,
    models/showo.py showo_t2i_generate_cached).

    Text rows precede the image span and attend only causally backwards
    (omni_attn_mask semantics, show-o2/models/omni_attention.py:56-70),
    so their K/V never see the latents: one forward with ZERO latents
    yields their exact K/V for every euler step.  The span rows' cache
    entries are placeholders — the cached velocity step overwrites them
    each evaluation.  Returns (qwen_kv, dit_kv).
    """
    B, L = text_tokens.shape
    input_embeds = params["showo"]["embed"][text_tokens]
    dtype = input_embeds.dtype
    M = modality_positions.shape[1]
    lat = jnp.zeros((B * M, cfg.image_latent_dim, cfg.image_latent_height,
                     cfg.image_latent_width), dtype)
    t = jnp.zeros((B * M,), jnp.float32)
    image_embeds = embed_images(cfg, params, lat)
    time_embeds = time_embed_apply(params["time_embed"], t, dtype)
    if "time_embed_proj" in params:
        tp = params["time_embed_proj"]
        time_embeds_proj = time_embeds @ tp["kernel"] + tp["bias"]
    else:
        time_embeds_proj = time_embeds
    input_embeds = modality_scatter(input_embeds, image_embeds,
                                    time_embeds_proj, modality_positions,
                                    add_time_embeds=cfg.add_time_embeds)
    cache = Qwen2KVCache.zeros(cfg.llm, B, L, dtype=dtype)
    _, h, qcache = qwen2_forward(cfg.llm, params["showo"],
                                 input_embeds=input_embeds,
                                 attention_bias=attention_bias,
                                 cache=cache, attn_meta=attn_meta)
    if "diff_proj" in params:
        dp = params["diff_proj"]
        h = h @ dp["fc1"]["kernel"] + dp["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ dp["fc2"]["kernel"] + dp["fc2"]["bias"]
    _, dit_kv = dit_forward(cfg.dit, params["diffusion_head_a"], h,
                            time_embeds, attention_bias,
                            modality_positions,
                            attn_meta=_dit_meta(attn_meta), return_kv=True)
    return (qcache.k, qcache.v), dit_kv


def showo2_t2i_velocity_cached(
    cfg: Showo2Config,
    params: Dict[str, Any],
    image_latents: jnp.ndarray,        # [B, C, H, W] (M = 1 spans)
    t: jnp.ndarray,                    # [B]
    bias_fresh: jnp.ndarray,           # [B, 1, n_img, L_full]
    modality_positions: jnp.ndarray,   # FULL-sequence [B, 1, 2]
    qwen_kv,
    dit_kv,
    guidance_scale: float = 0.0,
    attn_meta=None,
):
    """One velocity evaluation re-forwarding ONLY the image-span rows
    against the prefilled constant K/V — per-step cost drops by the text
    fraction of the sequence in BOTH towers.  Bit-identical to
    showo2_t2i_velocity: the fresh rows see exactly the same K set (text
    K/V from prefill + their own), same rope positions, same adaLN spans.
    Offsets may differ per batch row (the CFG null prompt's span starts
    at 2): fresh K/V are scattered per row and q positions ride per-row
    metadata."""
    dtype = params["showo"]["embed"].dtype
    image_embeds = embed_images(cfg, params, image_latents.astype(dtype))
    time_embeds = time_embed_apply(params["time_embed"], t, dtype)
    if "time_embed_proj" in params:
        tp = params["time_embed_proj"]
        time_embeds_proj = time_embeds @ tp["kernel"] + tp["bias"]
    else:
        time_embeds_proj = time_embeds
    if cfg.add_time_embeds:
        fresh = jnp.concatenate([time_embeds_proj[:, None, :].astype(dtype),
                                 image_embeds], axis=1)
    else:
        fresh = image_embeds
    B, n, _ = fresh.shape
    offsets = modality_positions[:, 0, 0]
    pos_ids = offsets[:, None] + jnp.arange(n)

    cache = Qwen2KVCache(qwen_kv[0], qwen_kv[1], jnp.zeros((), jnp.int32))
    _, h, _ = qwen2_forward(cfg.llm, params["showo"], input_embeds=fresh,
                            attention_bias=bias_fresh,
                            position_ids=pos_ids, cache=cache,
                            cache_offsets=offsets, attn_meta=attn_meta)
    if "diff_proj" in params:
        dp = params["diff_proj"]
        h = h @ dp["fc1"]["kernel"] + dp["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ dp["fc2"]["kernel"] + dp["fc2"]["bias"]
    mp_fresh = jnp.broadcast_to(
        jnp.asarray([[0, n]], jnp.int32)[None], (B, 1, 2))
    # mp_fresh covers every window row -> the adaLN span machinery
    # collapses to [B, 1, D] broadcasts (span_modulation full_span)
    h = dit_forward(cfg.dit, params["diffusion_head_a"], h, time_embeds,
                    bias_fresh, mp_fresh, attn_meta=_dit_meta(attn_meta),
                    positions=pos_ids, cache=dit_kv, cache_offsets=offsets,
                    full_span=True)
    v_seq = final_layer_apply(params["diffusion_head_b"], h, time_embeds,
                              mp_fresh, full_span=True)
    h_ = cfg.image_latent_height // cfg.patch_size
    w_ = cfg.image_latent_width // cfg.patch_size
    v = extract_v(cfg, v_seq, mp_fresh, h_, w_)

    if guidance_scale > 0:
        v_cond, v_uncond = jnp.split(v, 2, axis=0)
        v_g = v_uncond + guidance_scale * (v_cond - v_uncond)
        return jnp.concatenate([v_g, v_g], axis=0)
    return v


def showo2_t2i_velocity(
    cfg: Showo2Config,
    params: Dict[str, Any],
    text_tokens: jnp.ndarray,
    image_latents: jnp.ndarray,
    t: jnp.ndarray,
    attention_bias: jnp.ndarray,
    modality_positions: jnp.ndarray,
    guidance_scale: float = 0.0,
    first_frame_as_cond: bool = False,
    only_denoise_last_image: bool = False,
    num_frames: int = 0,
    attn_meta=None,
):
    """One velocity evaluation with CFG (t2i_generate, :467-514).

    When guidance_scale > 0, text_tokens/latents/t are the doubled
    [cond; uncond] batch and the returned v is the guided field duplicated
    to both halves (as the reference does for the ODE integrator).
    num_frames > 0 selects the video path ([.., C, T, H, W] latents).
    """
    out = showo2_forward(cfg, params, text_tokens, image_latents, t,
                         attention_bias, modality_positions,
                         attn_meta=attn_meta)
    h_ = cfg.image_latent_height // cfg.patch_size
    w_ = cfg.image_latent_width // cfg.patch_size
    v = extract_v(cfg, out["v_seq"], modality_positions, h_, w_,
                  num_frames=num_frames)

    if first_frame_as_cond:
        # i2v: zero the v-prediction for the conditioning first frame
        # (modeling_showo2_qwen2_5.py:436-441)
        v = v.at[:, :, :1].set(0.0)

    if only_denoise_last_image:
        # zero v for all but the last image (history kept clean),
        # modeling_showo2_qwen2_5.py:444-463
        B = text_tokens.shape[0]
        M = modality_positions.shape[1]
        per = v.reshape(B, M, *v.shape[1:])
        keep = jnp.arange(M)[None, :, None, None, None] == (M - 1)
        v = jnp.where(keep, per, 0.0).reshape(v.shape)

    if guidance_scale > 0:
        v_cond, v_uncond = jnp.split(v, 2, axis=0)
        v_g = v_uncond + guidance_scale * (v_cond - v_uncond)
        return jnp.concatenate([v_g, v_g], axis=0)
    return v
