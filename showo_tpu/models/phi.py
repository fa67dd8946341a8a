"""Phi-1.5 decoder, TPU-native: pure functions over an explicit param pytree.

Architecture parity with the reference fork (models/phi.py):
  * parallel attention+MLP residual: ``h = attn(ln(h)) + mlp(ln(h)) + h``
    with a single shared input layernorm (phi.py:774-790);
  * partial rotary embedding on the first ``partial_rotary_factor *
    head_dim`` dims, GPT-NeoX half-rotation convention (phi.py:163-198);
  * per-head qk-layernorm, forced on (phi.py:1088 ``config.qk_layernorm
    = True``);
  * fp32 upcast for the QK matmul and softmax (phi.py:359-367);
  * the caller's dense 4D additive mask flows through unchanged — the
    fork comments out HF causal-mask preparation (phi.py:1009-1026).

All 24 layers are stacked on a leading axis and executed with
``jax.lax.scan`` (fast compile, natural FSDP sharding axis).  The KV
cache is an explicit pytree threaded functionally — an intentional
upgrade over the reference's cacheless AR decode (modeling_showo.py:201),
bit-identical in outputs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 58498          # unified vocab (configs/showo_demo.yaml:19)
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_layers: int = 24
    num_heads: int = 32
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048
    # lax.scan unroll factor for the stacked-layer loop; >1 trades compile
    # time for better XLA scheduling across layer boundaries in decode
    scan_unroll: int = 1
    # fp32 QK/softmax upcast (reference parity, phi.py:359-367).  False
    # keeps scores in bf16 — an inference-speed option, off-parity.
    attn_fp32: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.partial_rotary_factor * self.head_dim)


class KVCache(NamedTuple):
    """Fixed-capacity decode cache. k/v: [L, B, S_max, H, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # int32 valid-position count: scalar, or [B]
    #                      per-lane lengths (continuous-batching serving)

    @classmethod
    def zeros(cls, cfg: PhiConfig, batch: int, max_len: int, dtype=jnp.float32):
        shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32))


def layer_norm(x, scale, bias, eps):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dt)


# row window where the segment-matmul qk-LN wins (measured v5e, r5):
# mid-size row counts (the cached-MaskGIT window, B=2 x 258 = 516 rows:
# +4.7% t2i headline).  At single-token AR decode (rows ~ 1-8) the
# relayout is trivial and the extra matmul dispatches LOSE (351 -> 328
# tok/s); the B=1 MMU prefill (324 rows) also measured ~3% slower on
# the matmul form, so the floor sits above it; at train row counts
# (~11k) the fp32 operand materialization loses (302 -> 330 ms fwd).
_PACKED_LN_MIN_ROWS = 400
_PACKED_LN_MAX_ROWS = 4096


def head_layer_norm_packed(x, scale, bias, eps, head_dim: int):
    """Per-head LayerNorm on the PACKED [..., H*Dh] layout.

    Numerically the same two-pass (mean, then centered variance) LN as
    ``layer_norm`` applied per head.  Two formulations, picked by row
    count (both measured on v5e, round 5):

      * small M (decode/serving): per-head reductions as tiny MXU
        matmuls against a segment-indicator matrix — avoids the
        [..., H, 64] sub-lane reduce layout whose relayout copies cost
        ~1.7 ms/layer (+4.7% on the v1 t2i headline);
      * large M (training): the plain reshaped reduce — the matmul
        form's fp32 operand materialization costs more than the
        relayout there (330 vs 302 ms on the v1 train forward).

    scale/bias are the per-head [Dh] affine shared across heads."""
    dt = x.dtype
    HD = x.shape[-1]
    H = HD // head_dim
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    if not (_PACKED_LN_MIN_ROWS <= rows <= _PACKED_LN_MAX_ROWS):
        y = layer_norm(x.reshape(lead + (H, head_dim)), scale, bias, eps)
        return y.reshape(x.shape)
    seg = jnp.equal(jnp.arange(HD)[:, None] // head_dim,
                    jnp.arange(H)[None, :]).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    mean = (x32 @ seg) / head_dim                       # [..., H]
    mean_b = jnp.broadcast_to(mean[..., None],
                              lead + (H, head_dim)).reshape(x.shape)
    cent = x32 - mean_b
    var = (jnp.square(cent) @ seg) / head_dim           # [..., H]
    var_b = jnp.broadcast_to(var[..., None],
                             lead + (H, head_dim)).reshape(x.shape)
    y = cent * jax.lax.rsqrt(var_b + eps)
    return (y * jnp.tile(scale, H) + jnp.tile(bias, H)).astype(dt)


def _rope_tables(positions: jnp.ndarray, rotary_dim: int, theta: float):
    """cos/sin tables [..., rotary_dim] for GPT-NeoX convention."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32)
                                / rotary_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., rd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin, rotary_dim):
    """Partial rotary: rotate the first rotary_dim dims, pass the rest.

    q, k: [B, S, H, Dh]; cos/sin: [B, S, rotary_dim] (broadcast over heads).
    """
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    q_rot, q_pass = q[..., :rotary_dim], q[..., rotary_dim:]
    k_rot, k_pass = k[..., :rotary_dim], k[..., rotary_dim:]
    q_rot = q_rot * cos + _rotate_half(q_rot) * sin
    k_rot = k_rot * cos + _rotate_half(k_rot) * sin
    return (jnp.concatenate([q_rot, q_pass], -1),
            jnp.concatenate([k_rot, k_pass], -1))


def _attention(q, k, v, bias, attn_meta=None, q_positions=None,
               softmax_dtype=jnp.float32):
    """q,k,v: [B, S, H, Dh]; bias: [B, 1, Q, K] additive.

    attn_meta: optional ("pallas"|"pallas_packed", seg, pad, last_pad,
    prefix) span metadata — routes to a Pallas fused omni-attention kernel
    (mask recomputed in-kernel, no S x S bias); None uses the dense
    fp32-softmax path.  q_positions enables the Q != K prefix-cached
    kernel paths.
    """
    if attn_meta is not None:
        impl = attn_meta[0] if isinstance(attn_meta[0], str) else "pallas"
        meta = attn_meta[1:] if isinstance(attn_meta[0], str) else attn_meta
        seg, pad, last_pad, prefix = meta
        if impl == "pallas_decode":
            # bias-driven fused decode kernel (scores+softmax+PV in VMEM);
            # requires the dense additive bias — metadata unused
            assert bias is not None, "pallas_decode needs the additive bias"
            from showo_tpu.ops.decode_attention import decode_attention

            return decode_attention(q, k, v, bias)
        if impl == "pallas_trainable":
            # differentiable flash kernels (custom VJP): the training-path
            # attention — no S x S scores in HBM on forward OR backward.
            # Small/medium S uses the packed plan (one program per row
            # block, mask computed once, head loop); long S falls back to
            # the K-blocked streaming kernels inside the dispatcher.
            from showo_tpu.ops.packed_attention_grad import \
                omni_attention_packed_trainable

            B_, S_, H_, Dh_ = q.shape
            out = omni_attention_packed_trainable(
                q.reshape(B_, S_, H_ * Dh_),
                k.reshape(B_, k.shape[1], H_ * Dh_),
                v.reshape(B_, v.shape[1], H_ * Dh_),
                seg, pad, last_pad, prefix, num_heads=H_)
            return out.reshape(B_, S_, H_, Dh_)
        if impl == "pallas_streaming":
            # online-softmax K-blocked kernel: no VMEM ceiling on S
            from showo_tpu.ops.streaming_attention import \
                omni_attention_streaming

            out = omni_attention_streaming(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), seg, pad, last_pad, prefix,
                q_positions=q_positions)
            return jnp.swapaxes(out, 1, 2)
        if impl == "pallas_packed":
            from showo_tpu.ops.flash_attention import omni_attention_packed

            B, S, H, Dh = q.shape
            out = omni_attention_packed(
                q.reshape(B, S, H * Dh), k.reshape(B, k.shape[1], H * Dh),
                v.reshape(B, v.shape[1], H * Dh), seg, pad, last_pad,
                prefix, num_heads=H, q_positions=q_positions)
            return out.reshape(B, S, H, Dh)
        from showo_tpu.ops.flash_attention import omni_attention

        out = omni_attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                             jnp.swapaxes(v, 1, 2), seg, pad, last_pad,
                             prefix, q_positions=q_positions)
        return jnp.swapaxes(out, 1, 2)
    head_dim = q.shape[-1]
    # operands stay in their storage dtype; the MXU multiplies bf16 inputs
    # exactly into the fp32 accumulator, so preferred_element_type=fp32 is
    # bit-identical to casting bf16 q/k to fp32 first (the reference's
    # fp32-upcast, phi.py:359-362) while avoiding the fp32 operand
    # materialization + fp32-rate MXU pass (2.2x faster at decode shapes,
    # tools/probe_attn_decode.py)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=softmax_dtype,
    ) / math.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias.astype(softmax_dtype)
    probs = jax.nn.softmax(scores.astype(softmax_dtype),
                           axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def fuse_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert separate q/k/v projections into a fused qkv kernel
    (numerically identical; better MXU utilization at small batch)."""
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


def fuse_parallel_mlp(params: Dict[str, Any]) -> Dict[str, Any]:
    """Exploit the parallel attn+MLP residual: qkv and fc1 share the same
    layernormed input, and the attn-dense and fc2 outputs are summed into
    the residual — so each layer's four projections collapse into TWO wide
    matmuls:

        win  = [Wqkv | Wfc1]            x_ln @ win -> [qkv | mlp_pre]
        wout = [Wdense; Wfc2] (stacked)  [attn, gelu(mlp_pre)] @ wout

    Mathematically identical (fp32-accumulation order differs at eps
    level); bigger matmuls keep the MXU busy at decode token counts.
    Inference-path transform, applied after :func:`fuse_qkv`."""
    L = dict(params["layers"])
    if "win" in L:
        return params
    if "qkv" not in L:
        params = fuse_qkv(params)
        L = dict(params["layers"])
    L["win"] = {
        "kernel": jnp.concatenate([L["qkv"]["kernel"], L["fc1"]["kernel"]],
                                  axis=-1),
        "bias": jnp.concatenate([L["qkv"]["bias"], L["fc1"]["bias"]],
                                axis=-1),
    }
    L["wout"] = {
        "kernel": jnp.concatenate([L["dense"]["kernel"], L["fc2"]["kernel"]],
                                  axis=-2),
        "bias": L["dense"]["bias"] + L["fc2"]["bias"],
    }
    for name in ("qkv", "fc1", "dense", "fc2"):
        del L[name]
    return dict(params, layers=L)


_QUANT_KERNELS = ("q", "k", "v", "qkv", "dense", "fc1", "fc2",
                  "win", "wout")


def _wk(p: Dict[str, Any]) -> jnp.ndarray:
    """Matmul kernel access: dequantize on read for int8 serving params.

    XLA fuses the astype+scale into the matmul's weight-tile loads, so
    int8 weights halve the HBM traffic of bandwidth-bound decode steps
    (measured 1.2x on the fused-mlp matvec shape,
    tools/probe_int8_decode.py)."""
    if "kernel_i8" in p:
        return p["kernel_i8"].astype(jnp.bfloat16) * p["scale"]
    return p["kernel"]


def quantize_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only per-output-channel symmetric int8 for the inference
    matmul kernels (serving mode; biases / norms / embed stay bf16).

    Works on any fusion state (plain, fuse_qkv, fuse_parallel_mlp) plus
    lm_head.  Near-lossless: top-1 logit agreement tested in
    tests/test_int8_decode.py.  The reference has no quantized path."""
    def q(p):
        kernel = p["kernel"]
        amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2,
                       keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        qk = jnp.round(kernel.astype(jnp.float32) / scale
                       ).clip(-127, 127).astype(jnp.int8)
        out = dict(p)
        del out["kernel"]
        out["kernel_i8"] = qk
        out["scale"] = scale.astype(jnp.bfloat16)
        return out

    L = dict(params["layers"])
    for name in _QUANT_KERNELS:
        if name in L and "kernel" in L[name]:
            L[name] = q(L[name])
    out = dict(params, layers=L)
    if "lm_head" in out:
        out["lm_head"] = q(out["lm_head"])
    return out


def init_phi_params(cfg: PhiConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (normal 0.02) with the stacked-layer layout."""
    L, D, F, H, Dh = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                      cfg.num_heads, cfg.head_dim)
    ks = jax.random.split(key, 8)
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    o = lambda shape: jnp.ones(shape, dtype)
    return {
        "embed": n(ks[0], (cfg.vocab_size, D)),
        "layers": {
            "ln": {"scale": o((L, D)), "bias": z((L, D))},
            "q": {"kernel": n(ks[1], (L, D, D)), "bias": z((L, D))},
            "k": {"kernel": n(ks[2], (L, D, D)), "bias": z((L, D))},
            "v": {"kernel": n(ks[3], (L, D, D)), "bias": z((L, D))},
            "q_ln": {"scale": o((L, Dh)), "bias": z((L, Dh))},
            "k_ln": {"scale": o((L, Dh)), "bias": z((L, Dh))},
            "dense": {"kernel": n(ks[4], (L, D, D)), "bias": z((L, D))},
            "fc1": {"kernel": n(ks[5], (L, D, F)), "bias": z((L, F))},
            "fc2": {"kernel": n(ks[6], (L, F, D)), "bias": z((L, D))},
        },
        "final_ln": {"scale": o((D,)), "bias": z((D,))},
        "lm_head": {"kernel": n(ks[7], (D, cfg.vocab_size)), "bias": z((cfg.vocab_size,))},
    }


def _cache_scatter(ck, cv, k, v, index):
    """Write fresh K/V rows into the cache at ``index``.

    index is a scalar (single shared decode offset) or an int32 [B] vector
    of per-lane offsets — the continuous-batching serving path where every
    batch lane decodes a different request at a different length
    (showo_tpu/serving/engine.py)."""
    if getattr(index, "ndim", 0) == 1:
        upd = jax.vmap(
            lambda c, x, o: jax.lax.dynamic_update_slice(c, x, (o, 0, 0)))
        return (upd(ck, k.astype(ck.dtype), index),
                upd(cv, v.astype(cv.dtype), index))
    ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                      (0, index, 0, 0))
    cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                      (0, index, 0, 0))
    return ck, cv


def _layer(cfg: PhiConfig, lp: Dict[str, Any], h: jnp.ndarray,
           bias: Optional[jnp.ndarray], cos, sin,
           cache_kv=None, cache_index=None, attn_meta=None,
           static_prefix: bool = False, attn_impl: Optional[str] = None):
    """One decoder layer. lp holds this layer's (unstacked) params.

    attn_impl carries the attention impl string when attn_meta had it
    split off (strings cannot be jax.checkpoint operands under remat;
    phi_forward rebinds it via functools.partial).

    Returns (h_out, (k_full, v_full)) where k_full/v_full are the KV
    entries to store (either the fresh S positions, or the updated cache).
    """
    if attn_impl is not None and attn_meta is not None:
        attn_meta = (attn_impl,) + tuple(attn_meta)
    B, S, D = h.shape
    H, Dh = cfg.num_heads, cfg.head_dim

    x = layer_norm(h, lp["ln"]["scale"], lp["ln"]["bias"], cfg.layer_norm_eps)

    if "win" in lp:
        # fully fused parallel-residual layer (see fuse_parallel_mlp)
        y = x @ _wk(lp["win"]) + lp["win"]["bias"]
        if (attn_meta is not None and attn_meta[0] == "pallas_fused"
                and cache_kv is not None and static_prefix):
            # decode megakernel: qk-LN + rope + cache concat + masked
            # attention in one Pallas program straight off the win output
            from showo_tpu.ops.fused_decode import fused_decode_attention

            seg_m, pad_m, lastpad_m, prefix_m = attn_meta[1:]
            ck, cv = cache_kv                  # [B, P, H, Dh]
            Pc = ck.shape[1]
            q_pos = cache_index + jnp.arange(S)
            attn = fused_decode_attention(
                y, ck.reshape(B, Pc, D), cv.reshape(B, Pc, D),
                lp["q_ln"], lp["k_ln"], cos[0], sin[0],
                seg_m, pad_m, lastpad_m, prefix_m, q_pos,
                hidden=D, num_heads=H, rotary_dim=cfg.rotary_dim,
                eps=cfg.layer_norm_eps,
                softmax_dtype=jnp.float32 if cfg.attn_fp32 else jnp.bfloat16)
            mlp_pre = y[..., 3 * D:]
            z = jnp.concatenate(
                [attn, jax.nn.gelu(mlp_pre, approximate=True)], axis=-1)
            return (h + z @ _wk(lp["wout"]) + lp["wout"]["bias"],
                    (ck, cv))
        qkv, mlp_pre = y[..., :3 * D], y[..., 3 * D:]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = head_layer_norm_packed(q, lp["q_ln"]["scale"],
                                   lp["q_ln"]["bias"], cfg.layer_norm_eps,
                                   Dh).reshape(B, S, H, Dh)
        k = head_layer_norm_packed(k, lp["k_ln"]["scale"],
                                   lp["k_ln"]["bias"], cfg.layer_norm_eps,
                                   Dh).reshape(B, S, H, Dh)
        v = v.reshape(B, S, H, Dh)
        q, k = apply_rope(q, k, cos, sin, cfg.rotary_dim)
        if cache_kv is not None and static_prefix:
            ck, cv = cache_kv
            k_att = jnp.concatenate([ck, k.astype(ck.dtype)], axis=1)
            v_att = jnp.concatenate([cv, v.astype(cv.dtype)], axis=1)
            new_kv = (ck, cv)
            q_positions = (cache_index + jnp.arange(S)
                           if attn_meta is not None else None)
        elif cache_kv is not None:
            ck, cv = _cache_scatter(*cache_kv, k, v, cache_index)
            k_att, v_att = ck, cv
            new_kv = (ck, cv)
            q_positions = (cache_index + jnp.arange(S)
                           if attn_meta is not None else None)
        else:
            k_att, v_att = k, v
            new_kv = (k, v)
            q_positions = None
        attn = _attention(
            q, k_att, v_att, bias, attn_meta, q_positions,
            softmax_dtype=jnp.float32 if cfg.attn_fp32 else jnp.bfloat16,
        ).reshape(B, S, D)
        z = jnp.concatenate(
            [attn, jax.nn.gelu(mlp_pre, approximate=True)], axis=-1)
        return h + z @ _wk(lp["wout"]) + lp["wout"]["bias"], new_kv

    from jax.ad_checkpoint import checkpoint_name

    if "qkv" in lp:
        # fused projection: one wide matmul keeps the MXU busy at small
        # token counts (numerically identical to three separate matmuls)
        qkv = checkpoint_name(x @ _wk(lp["qkv"]) + lp["qkv"]["bias"],
                              "qkv_out")
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        # names for the intermediate remat policies (phi_forward):
        # remat="qkv" saves ONLY these three projections per layer
        # (~138 MB at the v1 recipe batch) and recomputes
        # ln/fc1/dense/attention on backward — vs "full" (saves just
        # layer inputs, recomputes all 4 matmuls) and "dots" (saves fc1
        # too -> OOMs at the recipe batch).  Tagged in the FLAT [B,S,D]
        # layout: the [B,S,H,Dh] head reshape pads Dh=64 up to the
        # 128-lane tile (+32% HBM per saved tensor, measured OOM).
        q = checkpoint_name(x @ _wk(lp["q"]) + lp["q"]["bias"], "qkv_out")
        k = checkpoint_name(x @ _wk(lp["k"]) + lp["k"]["bias"], "qkv_out")
        v = checkpoint_name(x @ _wk(lp["v"]) + lp["v"]["bias"], "qkv_out")

    # per-head qk-LN in the PACKED layout (segment-matmul reductions):
    # the [B,S,H,64] reduce layout cost ~1.7 ms/layer in relayout copies
    q = head_layer_norm_packed(q, lp["q_ln"]["scale"], lp["q_ln"]["bias"],
                               cfg.layer_norm_eps, Dh).reshape(B, S, H, Dh)
    k = head_layer_norm_packed(k, lp["k_ln"]["scale"], lp["k_ln"]["bias"],
                               cfg.layer_norm_eps, Dh).reshape(B, S, H, Dh)
    v = v.reshape(B, S, H, Dh)

    q, k = apply_rope(q, k, cos, sin, cfg.rotary_dim)

    if cache_kv is not None and static_prefix:
        # decode against a CONSTANT prefix: concat fresh K/V after the
        # prefix rows instead of dynamic_update_slice into the full cache
        # buffer — the cache is loop-invariant inside the sampling scan,
        # so in-place aliasing is impossible and each update would copy
        # the whole buffer per layer per step (~50 MB at 256^2 decode)
        ck, cv = cache_kv  # [B, P, H, Dh] (prefix rows only)
        k_att = jnp.concatenate([ck, k.astype(ck.dtype)], axis=1)
        v_att = jnp.concatenate([cv, v.astype(cv.dtype)], axis=1)
        new_kv = (ck, cv)
        q_positions = (cache_index + jnp.arange(S)
                       if attn_meta is not None else None)
    elif cache_kv is not None:
        # cache_kv: [B, S_max, H, Dh]; cache_index scalar or per-lane [B]
        ck, cv = _cache_scatter(*cache_kv, k, v, cache_index)
        k_att, v_att = ck, cv
        new_kv = (ck, cv)
        q_positions = (cache_index + jnp.arange(S)
                       if attn_meta is not None else None)
    else:
        k_att, v_att = k, v
        new_kv = (k, v)
        q_positions = None

    # "attn_out" tag: the remat rungs qkv_attn / qkv_fc1_attn save this
    # [B,S,D] tensor so backward recomputes ONLY the S x S attention
    # internals (QK matmul + softmax, ~3% of layer FLOPs at S=387) —
    # never the four big matmuls, and never materializing the fp32
    # probs that OOM remat=none (f32[L,B,H,S,S] ~ 17.9 GB at the recipe
    # batch).
    attn = checkpoint_name(_attention(
        q, k_att, v_att, bias, attn_meta, q_positions,
        softmax_dtype=jnp.float32 if cfg.attn_fp32 else jnp.bfloat16,
    ).reshape(B, S, D), "attn_out")
    attn = attn @ _wk(lp["dense"]) + lp["dense"]["bias"]

    fc1 = checkpoint_name(x @ _wk(lp["fc1"]) + lp["fc1"]["bias"], "fc1_out")
    mlp = jax.nn.gelu(fc1, approximate=True)
    mlp = mlp @ _wk(lp["fc2"]) + lp["fc2"]["bias"]

    return h + attn + mlp, new_kv


def phi_forward(
    cfg: PhiConfig,
    params: Dict[str, Any],
    input_ids: Optional[jnp.ndarray] = None,
    input_embeds: Optional[jnp.ndarray] = None,
    attention_bias: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    remat: bool = False,
    attn_meta=None,
    lm_head_slice=None,
    static_prefix_len: Optional[int] = None,
):
    """Full forward. Returns (logits, new_cache_or_None).

    attention_bias: [B, 1, Q, K] additive mask (already inverted).  When a
    cache is passed, K must equal the cache capacity and the bias must mask
    out positions >= cache.length + Q.
    attn_meta: optional (seg, pad, last_pad, prefix) span metadata routing
    attention through the Pallas omni kernel (full-sequence path only).
    lm_head_slice: optional (row_lo, row_hi, col_lo, col_hi) — compute
    logits only for those sequence rows / vocab columns (e.g. image
    positions x codebook slice during MaskGIT, a ~14x smaller head matmul
    than the full unified vocab).
    """
    if input_embeds is None:
        input_embeds = params["embed"][input_ids]
    B, S, _ = input_embeds.shape

    if position_ids is None:
        start = cache.length if cache is not None else 0
        if getattr(start, "ndim", 0) == 1:    # per-lane decode offsets
            start = start[:, None]
        position_ids = start + jnp.arange(S)[None, :]
    cos, sin = _rope_tables(position_ids, cfg.rotary_dim, cfg.rope_theta)

    h = input_embeds
    import functools as _ft

    # split the impl string out of attn_meta: strings cannot ride through
    # jax.checkpoint as operands — rebind statically via partial
    attn_impl = None
    if attn_meta is not None and isinstance(attn_meta[0], str):
        attn_impl, attn_meta = attn_meta[0], attn_meta[1:]
    base_layer = _layer
    if static_prefix_len is not None:
        base_layer = _ft.partial(base_layer, static_prefix=True)
    if attn_impl is not None:
        base_layer = _ft.partial(base_layer, attn_impl=attn_impl)
    # remat ladder (utils/remat.py, shared with the v2 towers): "full"
    # recomputes the whole layer, "dots"/"qkv"/"qkv_fc1"/"qkv_attn"/
    # "qkv_fc1_attn" save progressively more tagged matmul outputs (see
    # _layer's checkpoint_name tags); prevent_cse=False under the scan
    from showo_tpu.utils.remat import wrap_remat

    layer_fn = wrap_remat(base_layer, remat, static_argnums=(0,))

    if cache is not None and static_prefix_len is not None:
        # decode against a constant prefix (no cache writes; see _layer).
        # The attention K layout is [prefix | fresh] = positions 0..P+S,
        # so the caller's bias must cover exactly P+S key columns.
        P = static_prefix_len
        ck, cv = cache.k[:, :, :P], cache.v[:, :, :P]

        def body(h, xs):
            lp, layer_kv = xs
            h, _ = layer_fn(cfg, lp, h, attention_bias[..., :P + S],
                            cos, sin, layer_kv, P, attn_meta)
            return h, None

        h, _ = jax.lax.scan(body, h, (params["layers"], (ck, cv)),
                            unroll=cfg.scan_unroll)
        new_cache = cache
    elif cache is not None:
        def body(h, xs):
            lp, layer_kv = xs
            h, new_kv = layer_fn(cfg, lp, h, attention_bias, cos, sin,
                                 layer_kv, cache.length, attn_meta)
            return h, new_kv

        h, (new_k, new_v) = jax.lax.scan(body, h, (params["layers"],
                                                   (cache.k, cache.v)),
                                         unroll=cfg.scan_unroll)
        new_cache = KVCache(new_k, new_v, cache.length + S)
    else:
        def body(h, lp):
            h, _ = layer_fn(cfg, lp, h, attention_bias, cos, sin, None, None,
                            attn_meta)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"],
                            unroll=cfg.scan_unroll)
        new_cache = None

    h = layer_norm(h, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   cfg.layer_norm_eps)
    kernel, bias_h = _wk(params["lm_head"]), params["lm_head"]["bias"]
    if lm_head_slice is not None:
        r0, r1, c0, c1 = lm_head_slice
        h = h[:, r0:r1]
        kernel = kernel[:, c0:c1]
        bias_h = bias_h[c0:c1]
    logits = h @ kernel + bias_h
    return logits, new_cache
