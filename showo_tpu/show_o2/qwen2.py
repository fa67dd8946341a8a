"""Qwen2/2.5 decoder, TPU-native (pure functions over a stacked pytree).

Parity with the reference fork (show-o2/models/qwen2.py):
  * RMSNorm (fp32 internals), SwiGLU MLP, GQA with qkv bias / no o bias;
  * full-head RoPE (default rope_type), theta 1e6 for Qwen2.5;
  * **the fork's raw mask passthrough**: `_update_causal_mask` is commented
    out so the caller's dense 4D additive omni mask is used as-is
    (qwen2.py:876-880);
  * tied word embeddings for the 1.5B config.

Same execution strategy as showo_tpu.models.phi: stacked layers +
``lax.scan``, functional KV cache.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151940          # 151936 + [PAD], <image>, vid_start/end
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    head_dim: int = 128
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768
    # layer-loop unroll (see models/phi.py: full unroll lets XLA schedule
    # across layer boundaries; measured +2.6% on v1 decode)
    scan_unroll: int = 1
    # fp32 attention scores/softmax (parity default — the reference
    # upcasts); False = bf16 score storage, a throughput mode that
    # halves the [B,H,S,S] HBM traffic on the dense path
    attn_fp32: bool = True


class Qwen2KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, S_max, Hkv, Dh]
    v: jnp.ndarray
    length: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.float32):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32))


def rms_norm(x, scale, eps):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale).astype(dt)


def rope_tables(positions, head_dim, theta):
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope_full(q, k, cos, sin):
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    return (q * cos + _rotate_half(q) * sin,
            k * cos + _rotate_half(k) * sin)


def init_qwen2_params(cfg: Qwen2Config, key, dtype=jnp.float32) -> Dict[str, Any]:
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 9)
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    o = lambda shape: jnp.ones(shape, dtype)
    params = {
        "embed": n(ks[0], (cfg.vocab_size, D)),
        "layers": {
            "input_ln": {"scale": o((L, D))},
            "post_ln": {"scale": o((L, D))},
            "q": {"kernel": n(ks[1], (L, D, H * Dh)), "bias": z((L, H * Dh))},
            "k": {"kernel": n(ks[2], (L, D, Hkv * Dh)), "bias": z((L, Hkv * Dh))},
            "v": {"kernel": n(ks[3], (L, D, Hkv * Dh)), "bias": z((L, Hkv * Dh))},
            "o": {"kernel": n(ks[4], (L, H * Dh, D))},
            "gate": {"kernel": n(ks[5], (L, D, F))},
            "up": {"kernel": n(ks[6], (L, D, F))},
            "down": {"kernel": n(ks[7], (L, F, D))},
        },
        "final_ln": {"scale": o((D,))},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": n(ks[8], (D, cfg.vocab_size))}
    return params


def fuse_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate q/k/v projections into one [D, (H+2Hkv)*Dh] kernel —
    numerically identical, one wide MXU matmul instead of three narrow
    ones (the Qwen2 analog of models/phi.py fuse_qkv; k/v are only
    2 heads x 128 = 256 cols each, pathologically narrow alone)."""
    L = dict(params["layers"])
    if "qkv" in L:
        return params
    L["qkv"] = {
        "kernel": jnp.concatenate([L["q"]["kernel"], L["k"]["kernel"],
                                   L["v"]["kernel"]], axis=-1),
        "bias": jnp.concatenate([L["q"]["bias"], L["k"]["bias"],
                                 L["v"]["bias"]], axis=-1),
    }
    for name in ("q", "k", "v"):
        del L[name]
    return dict(params, layers=L)


def fuse_gate_up(params: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate the SwiGLU gate and up projections into one [D, 2F]
    kernel (both consume the same post-ln input)."""
    L = dict(params["layers"])
    if "gu" in L:
        return params
    L["gu"] = {"kernel": jnp.concatenate([L["gate"]["kernel"],
                                          L["up"]["kernel"]], axis=-1)}
    for name in ("gate", "up"):
        del L[name]
    return dict(params, layers=L)


def fuse_inference(params: Dict[str, Any]) -> Dict[str, Any]:
    """Both inference-path weight fusions (idempotent)."""
    return fuse_gate_up(fuse_qkv(params))


_QUANT_KERNELS = ("q", "k", "v", "qkv", "o", "gate", "up", "down", "gu")


def _wk(p: Dict[str, Any]) -> jnp.ndarray:
    """Kernel access with on-read int8 dequant (see models/phi.py::_wk;
    +65% v1 MMU tok/s measured — decode weight streaming halves)."""
    if "kernel_i8" in p:
        return p["kernel_i8"].astype(jnp.bfloat16) * p["scale"]
    return p["kernel"]


def quantize_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only per-output-channel symmetric int8 serving mode (the
    Qwen2 analog of models/phi.py::quantize_int8).  The tied-embedding
    head gets its own quantized ``lm_head`` (embed.T) so decode streams
    an int8 head while the input gather keeps the bf16 table."""
    def q(kernel):
        amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2,
                       keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        qk = jnp.round(kernel.astype(jnp.float32) / scale
                       ).clip(-127, 127).astype(jnp.int8)
        return {"kernel_i8": qk, "scale": scale.astype(jnp.bfloat16)}

    L = dict(params["layers"])
    for name in _QUANT_KERNELS:
        if name in L and "kernel" in L[name]:
            L[name] = {**L[name], **q(L[name]["kernel"])}
            del L[name]["kernel"]
    out = dict(params, layers=L)
    if "lm_head" in out and "kernel" in out["lm_head"]:
        out["lm_head"] = q(out["lm_head"]["kernel"])
    elif "lm_head" not in out:
        out["lm_head"] = q(out["embed"].T)
    return out


def _mlp(cfg: Qwen2Config, lp, x2):
    from jax.ad_checkpoint import checkpoint_name

    if "gu" in lp:
        F = cfg.intermediate_size
        gu = checkpoint_name(x2 @ _wk(lp["gu"]), "fc1_out")
        return (jax.nn.silu(gu[..., :F]) * gu[..., F:]) @ _wk(lp["down"])
    return (jax.nn.silu(checkpoint_name(x2 @ _wk(lp["gate"]), "fc1_out"))
            * checkpoint_name(x2 @ _wk(lp["up"]), "fc1_out")) \
        @ _wk(lp["down"])


def _layer(cfg: Qwen2Config, lp, h, bias, cos, sin, cache_kv=None,
           cache_index=None, attn_meta=None, attn_impl=None):
    B, S, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # checkpoint_name tags power the "qkv"/"qkv_fc1" remat policies
    # (utils/remat.py): save only these projections, recompute the rest
    from jax.ad_checkpoint import checkpoint_name

    x = rms_norm(h, lp["input_ln"]["scale"], cfg.rms_norm_eps)
    if "qkv" in lp:
        qkv = checkpoint_name(x @ _wk(lp["qkv"]) + lp["qkv"]["bias"],
                              "qkv_out")
        q = qkv[..., :H * Dh].reshape(B, S, H, Dh)
        k = qkv[..., H * Dh:(H + Hkv) * Dh].reshape(B, S, Hkv, Dh)
        v = qkv[..., (H + Hkv) * Dh:].reshape(B, S, Hkv, Dh)
    else:
        q = checkpoint_name(x @ _wk(lp["q"]) + lp["q"]["bias"], "qkv_out"
                            ).reshape(B, S, H, Dh)
        k = checkpoint_name(x @ _wk(lp["k"]) + lp["k"]["bias"], "qkv_out"
                            ).reshape(B, S, Hkv, Dh)
        v = checkpoint_name(x @ _wk(lp["v"]) + lp["v"]["bias"], "qkv_out"
                            ).reshape(B, S, Hkv, Dh)
    q, k = apply_rope_full(q, k, cos, sin)

    if cache_kv is not None:
        ck, cv = cache_kv
        if getattr(cache_index, "ndim", 0) == 1:
            # per-row write offsets (the t2i cached-window path: modality
            # offsets vary per batch row; v2's GQA cache is narrow enough
            # that the per-step buffer copy is negligible)
            upd = jax.vmap(
                lambda c, x, o: jax.lax.dynamic_update_slice(c, x, (o, 0, 0)))
            ck = upd(ck, k.astype(ck.dtype), cache_index)
            cv = upd(cv, v.astype(cv.dtype), cache_index)
        else:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, cache_index, 0, 0))
        k_att, v_att = ck, cv
        new_kv = (ck, cv)
    else:
        k_att, v_att = k, v
        new_kv = (k, v)

    if attn_meta is not None:
        # Pallas omni kernels with GQA (no S x S bias in HBM).  The impl
        # string may arrive split out as attn_impl (static under remat —
        # strings cannot be jax.checkpoint operands) or as attn_meta[0].
        if isinstance(attn_meta[0], str):
            impl, impl_meta = attn_meta[0], attn_meta[1:]
        else:
            impl, impl_meta = attn_impl or "pallas_packed", attn_meta
        seg, pad, last_pad, prefix = impl_meta
        if cache_kv is None:
            q_positions = None
        elif getattr(cache_index, "ndim", 0) == 1:
            q_positions = cache_index[:, None] + jnp.arange(S)  # [B, S]
        else:
            q_positions = cache_index + jnp.arange(S)
        Skv = k_att.shape[1]
        if impl == "pallas_trainable":
            # differentiable flash kernels (custom VJP, no S x S in HBM):
            # packed plan at small/medium S, streaming K-blocked beyond
            # its VMEM budget (packed_attention_grad dispatcher)
            from showo_tpu.ops.packed_attention_grad import \
                omni_attention_packed_trainable

            attn = omni_attention_packed_trainable(
                q.reshape(B, S, H * Dh),
                k_att.reshape(B, k_att.shape[1], Hkv * Dh),
                v_att.reshape(B, v_att.shape[1], Hkv * Dh),
                seg, pad, last_pad, prefix, num_heads=H,
                num_kv_heads=Hkv)
        elif impl == "pallas_streaming":
            # online-softmax K-blocked kernel: no VMEM ceiling on S
            from showo_tpu.ops.streaming_attention import \
                omni_attention_streaming

            attn = omni_attention_streaming(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k_att, 1, 2),
                jnp.swapaxes(v_att, 1, 2), seg, pad, last_pad, prefix,
                q_positions=q_positions)
            attn = jnp.swapaxes(attn, 1, 2).reshape(B, S, H * Dh)
        else:
            from showo_tpu.ops.flash_attention import omni_attention_packed

            attn = omni_attention_packed(
                q.reshape(B, S, H * Dh), k_att.reshape(B, Skv, Hkv * Dh),
                v_att.reshape(B, Skv, Hkv * Dh), seg, pad, last_pad, prefix,
                num_heads=H, num_kv_heads=Hkv, q_positions=q_positions)
        # "attn_out": the qkv_attn/qkv_fc1_attn remat rungs save the
        # post-attention rows so backward skips the S x S recompute
        attn = checkpoint_name(attn, "attn_out") @ _wk(lp["o"])
        h = h + attn
        x2 = rms_norm(h, lp["post_ln"]["scale"], cfg.rms_norm_eps)
        return h + _mlp(cfg, lp, x2), new_kv

    # GQA: fold kv-head groups into the einsum instead of materializing
    # repeat_kv (reference qwen2.py repeats to H heads).  Operands stay in
    # their storage dtype: the MXU multiplies bf16 inputs exactly into the
    # fp32 accumulator, bit-identical to the reference's fp32 upcast
    # without the fp32 operand materialization + fp32-rate MXU pass (the
    # round-2 v1 finding, models/phi.py; 2.2x at decode shapes)
    G = H // Hkv
    qg = q.reshape(B, S, Hkv, G, Dh)
    sdt = jnp.float32 if cfg.attn_fp32 else jnp.bfloat16
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_att,
                        preferred_element_type=sdt) / math.sqrt(Dh)
    if bias is not None:
        scores = scores + bias[:, :, None].astype(sdt)
    probs = jax.nn.softmax(scores.astype(sdt), axis=-1).astype(v_att.dtype)
    attn = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v_att).reshape(B, S, H * Dh)
    # "attn_out": the qkv_attn/qkv_fc1_attn remat rungs save the
    # post-attention rows so backward skips the S x S recompute
    attn = checkpoint_name(attn, "attn_out") @ _wk(lp["o"])

    h = h + attn
    x2 = rms_norm(h, lp["post_ln"]["scale"], cfg.rms_norm_eps)
    return h + _mlp(cfg, lp, x2), new_kv


def qwen2_forward(
    cfg: Qwen2Config,
    params: Dict[str, Any],
    input_ids: Optional[jnp.ndarray] = None,
    input_embeds: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    cache: Optional[Qwen2KVCache] = None,
    remat: bool = False,
    attn_meta=None,
    cache_offsets: Optional[jnp.ndarray] = None,
):
    """Returns (logits, last_hidden_state, new_cache_or_None).

    cache_offsets: optional [B] per-row write offsets into the cache (the
    t2i cached-window path — fresh image-span rows land at each row's
    modality offset; requires explicit position_ids and a bias/attn_meta
    covering the full cache length).
    """
    if input_embeds is None:
        input_embeds = params["embed"][input_ids]
    B, S, _ = input_embeds.shape

    if position_ids is None:
        start = cache.length if cache is not None else 0
        position_ids = start + jnp.arange(S)[None, :]
    cos, sin = rope_tables(position_ids, cfg.head_dim, cfg.rope_theta)

    h = input_embeds
    # split the impl string from attn_meta: strings cannot be operands of
    # jax.checkpoint, so it rides as a static argument instead
    attn_impl = None
    if attn_meta is not None and isinstance(attn_meta[0], str):
        attn_impl, attn_meta = attn_meta[0], attn_meta[1:]
    from showo_tpu.utils.remat import wrap_remat

    layer_fn = wrap_remat(_layer, remat, static_argnums=(0, 9))

    if cache is not None:
        index = cache_offsets if cache_offsets is not None else cache.length

        def body(h, xs):
            lp, layer_kv = xs
            h, new_kv = layer_fn(cfg, lp, h, attention_bias, cos, sin,
                                 layer_kv, index, attn_meta,
                                 attn_impl)
            return h, new_kv

        h, (nk, nv) = jax.lax.scan(body, h, (params["layers"],
                                             (cache.k, cache.v)),
                                   unroll=cfg.scan_unroll)
        new_cache = Qwen2KVCache(nk, nv, cache.length + S)
    else:
        def body(h, lp):
            h, _ = layer_fn(cfg, lp, h, attention_bias, cos, sin, None, None,
                            attn_meta, attn_impl)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"],
                            unroll=cfg.scan_unroll)
        new_cache = None

    h = rms_norm(h, params["final_ln"]["scale"], cfg.rms_norm_eps)
    if "lm_head" in params:
        head = _wk(params["lm_head"])
    else:
        head = params["embed"].T
    logits = h @ head
    return logits, h, new_cache
