"""DiT diffusion head + shared v2 modules, TPU-native.

Parity with show-o2/models/modules.py:
  * DiffusionHeadConfig: hidden 2048, 32 heads / 8 kv heads, head_dim 64,
    SwiGLU 8192, RMSNorm qk-norm, llama3-scaled RoPE theta 5e5
    (modules.py:72-95);
  * ModulatedAttentionBlock: adaLN 6-way modulation applied only inside
    image spans from modality_positions (modules.py:109-218) — here the
    per-span scatter is vectorized (same span-id arithmetic as
    showo_tpu.show_o2.masks.modality_scatter);
  * FinalLayer: adaLN-modulated RMSNorm + linear to p^2*C (modules.py:778-806);
  * TimestepEmbedder: sinusoidal + MLP (modules.py:737-775);
  * PatchEmbed: p x p conv stride p, NHWC (modules.py:705-734);
  * modulate() computes in fp32 (modules.py:98-106).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from showo_tpu.show_o2.qwen2 import _rotate_half, rms_norm


@dataclasses.dataclass(frozen=True)
class DiffusionHeadConfig:
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 64
    rms_norm_eps: float = 1e-5
    rope_theta: float = 5e5
    qk_norm: bool = True
    # llama3 rope scaling
    rope_factor: float = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    scan_unroll: int = 1  # see models/phi.py
    rope_original_max_position: int = 8192
    num_layers: int = 10
    attn_fp32: bool = True  # see Qwen2Config.attn_fp32


def llama3_rope_tables(positions, cfg: DiffusionHeadConfig):
    """llama3-type scaled RoPE (transformers ROPE_INIT 'llama3')."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    low_wav = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wav = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2 * jnp.pi / inv_freq
    inv_scaled = inv_freq / cfg.rope_factor
    smooth = ((cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor)
              / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor))
    smoothed = (1 - smooth) * inv_scaled + smooth * inv_freq
    is_medium = (wavelen < low_wav) & (wavelen > high_wav)
    inv = jnp.where(wavelen > low_wav, inv_scaled,
                    jnp.where(is_medium, smoothed, inv_freq))
    freqs = positions[..., None].astype(jnp.float32) * inv
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def head_rms_norm_packed(x, scale, eps, head_dim: int):
    """Per-head RMSNorm on the PACKED [..., H*Dh] layout: the per-head
    sum-of-squares runs as a tiny MXU segment matmul instead of a
    sub-lane reduce over the trailing Dh=64 axis (the relayout-copy
    pathology measured on the v1 qk-LN, models/phi.py
    head_layer_norm_packed — same windowed dispatch)."""
    from showo_tpu.models.phi import (_PACKED_LN_MAX_ROWS,
                                      _PACKED_LN_MIN_ROWS)

    dt = x.dtype
    HD = x.shape[-1]
    H = HD // head_dim
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    if not (_PACKED_LN_MIN_ROWS <= rows <= _PACKED_LN_MAX_ROWS):
        y = rms_norm(x.reshape(lead + (H, head_dim)), scale, eps)
        return y.reshape(x.shape)
    seg = jnp.equal(jnp.arange(HD)[:, None] // head_dim,
                    jnp.arange(H)[None, :]).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    ms = (jnp.square(x32) @ seg) / head_dim             # [..., H]
    inv = jnp.broadcast_to(
        jax.lax.rsqrt(ms + eps)[..., None],
        lead + (H, head_dim)).reshape(x.shape)
    return (jnp.tile(scale, H) * (x32 * inv)).astype(dt)


def modulate(x, shift, scale):
    dt = x.dtype
    out = (x.astype(jnp.float32) * (1 + scale.astype(jnp.float32))
           + shift.astype(jnp.float32))
    return out.astype(dt)


def span_broadcast(values: jnp.ndarray, modality_positions: jnp.ndarray,
                   L: int, default: float) -> jnp.ndarray:
    """Spread per-image vectors [B*M, D] onto sequence positions [B, L, D]:
    positions inside span j of row i get values[i*M+j]; everything else the
    default (0 for shift/scale, 1 for gate).  Vectorized form of the loops
    at modules.py:175-183."""
    BM, D = values.shape
    M = modality_positions.shape[1]
    B = modality_positions.shape[0]
    pos = jnp.arange(L)[None, :, None]
    off = modality_positions[:, None, :, 0]
    length = modality_positions[:, None, :, 1]
    in_span = (pos >= off) & (pos < off + length)      # [B, L, M]
    span_id = jnp.argmax(
        jnp.where(in_span, jnp.arange(M)[None, None, :] + 1, 0), axis=-1)
    claimed = jnp.take_along_axis(in_span, span_id[:, :, None], axis=-1)[..., 0]
    flat = jnp.arange(B)[:, None] * M + span_id
    gathered = values[flat]                            # [B, L, D]
    return jnp.where(claimed[..., None], gathered,
                     jnp.full_like(gathered, default))


def span_modulation(ada: jnp.ndarray, modality_positions: jnp.ndarray,
                    L: int, n_chunks: int = 6, full_span: bool = False):
    """All adaLN modulation tensors in ONE one-hot einsum.

    ``ada`` is [B*M, n*D] (the per-span adaLN projection output); returns
    n tensors [B, L, D] where positions inside span j of row i get
    ada[i*M+j]'s chunk and everything else 0 (callers add the gate
    default themselves via the also-returned ``claimed`` [B, L] mask;
    ``claimed is None`` means every position is claimed).

    Numerically identical to n row-gather ``span_broadcast`` calls for
    non-overlapping spans (the one-hot matmul has exactly one 1 per
    row), but runs on the MXU instead of TPU gather hardware — gathers
    of [B, L, D] rows measured as the dominant DiT-head overhead
    (tools/probe_dit_breakdown.py).

    full_span=True is the static fast path for callers that KNOW the
    single span covers every row (the cached-window t2i path forwards
    only image-span rows, mp=(0, n)): the [B, L, n*D] materialization
    collapses to [B, 1, D] broadcasts — bit-identical, since the
    one-hot matmul with M=1 and all rows in-span just copies ada."""
    BM, DN = ada.shape
    B, M = modality_positions.shape[:2]
    if full_span:
        assert M == 1, "full_span fast path requires a single span"
        chunks = jnp.split(ada.reshape(B, 1, DN), n_chunks, axis=-1)
        return chunks, None
    if M == 1:
        # single-span fast path (every t2i/t2v call): no [B, L, D]
        # modulation tensors at all — return the per-sample [B, 1, D]
        # chunks plus the in-span row mask; consumers apply them with a
        # fused elementwise select (see _dit_layer), which XLA cannot
        # fail to fuse the way it can (and did, 2.2 ms/step) with the
        # one-hot dot form below.
        chunks = jnp.split(ada.reshape(B, 1, DN), n_chunks, axis=-1)
        off = modality_positions[:, 0, 0]
        length = modality_positions[:, 0, 1]
        pos = jnp.arange(L)
        claimed = ((pos[None, :] >= off[:, None])
                   & (pos[None, :] < (off + length)[:, None]))   # [B, L]
        return chunks, claimed
    pos = jnp.arange(L)
    off = modality_positions[..., 0]                    # [B, M]
    length = modality_positions[..., 1]
    in_span = ((pos[None, None, :] >= off[..., None])
               & (pos[None, None, :] < (off + length)[..., None]))  # [B,M,L]
    oh = in_span.astype(ada.dtype)
    ada = ada.reshape(B, M, DN)
    # one einsum PER CHUNK, not one [B, L, n*D] einsum split afterwards:
    # a single big product feeding 6 different consumer fusions is
    # materialized by XLA (measured: 10 top-level 48 MB multiplies in the
    # t2i DiT HLO = the entire 2.2 ms modulation overhead); per-chunk
    # products each have ONE consumer, so at M=1 (t2i) the K=1 dot is
    # rewritten to a broadcast-multiply and fused into the modulate /
    # gate fusion — zero HBM materialization, bit-identical math.
    D = DN // n_chunks
    chunks = [jnp.einsum("bml,bmk->blk", oh, ada[..., i * D:(i + 1) * D])
              for i in range(n_chunks)]
    claimed = jnp.any(in_span, axis=1)                  # [B, L]
    return chunks, claimed


def timestep_embedding(t, dim, max_period=10000):
    """Sinusoidal embedding (modules.py:749-768)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def time_embed_apply(p: Dict[str, Any], t, dtype, freq_dim=256):
    """TimestepEmbedder MLP over the sinusoidal embedding."""
    h = timestep_embedding(t, freq_dim).astype(dtype)
    h = h @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = jax.nn.silu(h)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def patch_embed_apply(p: Dict[str, Any], x, patch_size: int):
    """[B, H, W, C] -> [B, H/p * W/p, D] via p x p conv stride p."""
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(patch_size, patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (out + p["bias"]).reshape(x.shape[0], -1, p["kernel"].shape[-1])


def init_dit_params(cfg: DiffusionHeadConfig, key, dtype=jnp.float32):
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 10)
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    o = lambda shape: jnp.ones(shape, dtype)
    return {
        "layers": {
            "input_ln": {"scale": o((L, D))},
            "post_ln": {"scale": o((L, D))},
            "q": {"kernel": n(ks[0], (L, D, H * Dh))},
            "k": {"kernel": n(ks[1], (L, D, Hkv * Dh))},
            "v": {"kernel": n(ks[2], (L, D, Hkv * Dh))},
            "o": {"kernel": n(ks[3], (L, H * Dh, D))},
            "q_norm": {"scale": o((L, Dh))},
            "k_norm": {"scale": o((L, Dh))},
            "gate": {"kernel": n(ks[4], (L, D, F))},
            "up": {"kernel": n(ks[5], (L, D, F))},
            "down": {"kernel": n(ks[6], (L, F, D))},
            # adaLN zero-init (modules.py:128-129)
            "adaln": {"kernel": z((L, D, 6 * D)), "bias": z((L, 6 * D))},
        },
    }


def fuse_qkv(params):
    """Concatenate the DiT q/k/v kernels (no biases) into one wide matmul
    — numerically identical (the v2 analog of models/phi.py:184-200)."""
    L = dict(params["layers"])
    if "qkv" in L:
        return params
    L["qkv"] = {"kernel": jnp.concatenate(
        [L["q"]["kernel"], L["k"]["kernel"], L["v"]["kernel"]], axis=-1)}
    for name in ("q", "k", "v"):
        del L[name]
    return dict(params, layers=L)


def fuse_gate_up(params):
    """Concatenate SwiGLU gate/up kernels into one [D, 2F] matmul."""
    L = dict(params["layers"])
    if "gu" in L:
        return params
    L["gu"] = {"kernel": jnp.concatenate(
        [L["gate"]["kernel"], L["up"]["kernel"]], axis=-1)}
    for name in ("gate", "up"):
        del L[name]
    return dict(params, layers=L)


def fuse_inference(params):
    return fuse_gate_up(fuse_qkv(params))


def _dit_layer(cfg: DiffusionHeadConfig, lp, h, adaln_input, bias, cos, sin,
               modality_positions, attn_meta=None, attn_impl=None,
               cache_kv=None, cache_offsets=None, ada=None,
               full_span: bool = False):
    """One ModulatedAttentionBlock (modules.py:131-218).

    cache_kv: optional per-layer (ck, cv) [B, S_full, Hkv, Dh] K/V buffers
    holding the constant text rows (t2i cached-window inference); the
    fresh rows' K/V are scattered in at per-row ``cache_offsets`` and
    attention runs fresh-Q x full-K.  Returns (h_out, (k, v)) — the fresh
    roped K/V, collected by dit_forward's prefill pass.

    ada: optional precomputed adaLN projection [B*M, 6D] for this layer
    (dit_forward hoists all layers' projections into ONE pre-scan einsum
    — 10 small-M bandwidth-bound matmuls inside the scan otherwise)."""
    B, S, D = h.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = S

    if ada is None:
        ada = (jax.nn.silu(adaln_input) @ lp["adaln"]["kernel"]
               + lp["adaln"]["bias"])
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp
     ), claimed = span_modulation(ada, modality_positions, L,
                                  full_span=full_span)
    if claimed is not None and shift_msa.shape[1] == 1:
        # M=1 fast path: [B,1,D] per-sample chunks + [B,L] row mask.
        # Pure-elementwise select — in-span rows modulated/gated,
        # out-of-span rows pass through (bit-identical to the one-hot
        # form: modulate(x,0,0)=x exactly and gate defaults to 1).
        c = claimed[..., None]

        def _mod(xn, sh, sc):
            return jnp.where(c, modulate(xn, sh, sc), xn)

        def _gate(g, y):
            return jnp.where(c, g * y, y)
    else:
        if claimed is not None:
            # gate default is 1 outside spans (span_broadcast semantics)
            out_of_span = (~claimed)[..., None].astype(gate_msa.dtype)
            gate_msa = gate_msa + out_of_span
            gate_mlp = gate_mlp + out_of_span
        _mod = modulate

        def _gate(g, y):
            return g * y

    x = _mod(rms_norm(h, lp["input_ln"]["scale"], cfg.rms_norm_eps),
             shift_msa, scale_msa)

    # checkpoint_name tags power the "qkv"/"qkv_fc1" remat policies
    # (utils/remat.py): save only these projections, recompute the rest
    from jax.ad_checkpoint import checkpoint_name

    if "qkv" in lp:
        qkv = checkpoint_name(x @ lp["qkv"]["kernel"], "qkv_out")
        q = qkv[..., :H * Dh]
        k = qkv[..., H * Dh:(H + Hkv) * Dh]
        v = qkv[..., (H + Hkv) * Dh:]
    else:
        q = checkpoint_name(x @ lp["q"]["kernel"], "qkv_out")
        k = checkpoint_name(x @ lp["k"]["kernel"], "qkv_out")
        v = checkpoint_name(x @ lp["v"]["kernel"], "qkv_out")
    if cfg.qk_norm:
        # per-head RMS in the packed layout (segment-matmul reductions
        # at mid-size row counts; see head_rms_norm_packed)
        q = head_rms_norm_packed(q, lp["q_norm"]["scale"], 1e-6, Dh)
        k = head_rms_norm_packed(k, lp["k_norm"]["scale"], 1e-6, Dh)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, Hkv, Dh)
    v = v.reshape(B, S, Hkv, Dh)
    # reference applies qk-norm then RoPE with heads on axis 1; we keep
    # [B, S, H, Dh] layout and broadcast cos/sin over heads
    cos_b = cos[:, :, None, :].astype(q.dtype)
    sin_b = sin[:, :, None, :].astype(q.dtype)
    q = q * cos_b + _rotate_half(q) * sin_b
    k = k * cos_b + _rotate_half(k) * sin_b

    k_fresh, v_fresh = k, v
    if cache_kv is not None:
        ck, cv = cache_kv               # [B, S_full, Hkv, Dh]
        upd = jax.vmap(
            lambda c, x, o: jax.lax.dynamic_update_slice(c, x, (o, 0, 0)))
        ck = upd(ck, k.astype(ck.dtype), cache_offsets)
        cv = upd(cv, v.astype(cv.dtype), cache_offsets)
        k, v = ck, cv
        q_positions = cache_offsets[:, None] + jnp.arange(S)
    else:
        q_positions = None

    if attn_meta is not None:
        # same Pallas routing as qwen2._layer — the DiT head shares the
        # omni mask, so long-seq training avoids its S x S bias too
        if isinstance(attn_meta[0], str):
            impl, meta = attn_meta[0], attn_meta[1:]
        else:
            impl, meta = attn_impl or "pallas_streaming", attn_meta
        seg, pad, last_pad, prefix = meta
        if impl == "pallas_trainable":
            # packed plan at small/medium S, streaming beyond its VMEM
            # budget (packed_attention_grad dispatcher)
            from showo_tpu.ops.packed_attention_grad import \
                omni_attention_packed_trainable

            attn = omni_attention_packed_trainable(
                q.reshape(B, S, H * Dh),
                k.reshape(B, k.shape[1], Hkv * Dh),
                v.reshape(B, v.shape[1], Hkv * Dh),
                seg, pad, last_pad, prefix, num_heads=H,
                num_kv_heads=Hkv)
        elif impl == "pallas_packed":
            # inference: packed kernel keeps the [B,H,S,S] fp32 scores in
            # VMEM per q-block instead of HBM (the DiT head has H=32 —
            # 250 MB/layer of score traffic on the dense path at S=986)
            from showo_tpu.ops.flash_attention import omni_attention_packed

            Skv = k.shape[1]
            attn = omni_attention_packed(
                q.reshape(B, S, H * Dh), k.reshape(B, Skv, Hkv * Dh),
                v.reshape(B, Skv, Hkv * Dh), seg, pad, last_pad, prefix,
                num_heads=H, num_kv_heads=Hkv, q_positions=q_positions)
        else:
            from showo_tpu.ops.streaming_attention import \
                omni_attention_streaming

            attn = omni_attention_streaming(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), seg, pad, last_pad, prefix)
            attn = jnp.swapaxes(attn, 1, 2).reshape(B, S, H * Dh)
    else:
        G = H // Hkv
        qg = q.reshape(B, S, Hkv, G, Dh)
        # bf16 operands + fp32 accumulator: bit-identical to the fp32
        # upcast, no fp32 operand materialization (see qwen2._layer)
        sdt = jnp.float32 if cfg.attn_fp32 else jnp.bfloat16
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                            preferred_element_type=sdt) / math.sqrt(Dh)
        if bias is not None:
            scores = scores + bias[:, :, None].astype(sdt)
        probs = jax.nn.softmax(scores.astype(sdt), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v).reshape(B, S, H * Dh)
    # "attn_out": the qkv_attn/qkv_fc1_attn remat rungs save the
    # post-attention rows so backward skips the S x S recompute
    attn = checkpoint_name(attn, "attn_out") @ lp["o"]["kernel"]

    h = h + _gate(gate_msa, attn)

    x2 = _mod(rms_norm(h, lp["post_ln"]["scale"], cfg.rms_norm_eps),
              shift_mlp, scale_mlp)
    if "gu" in lp:
        F = lp["down"]["kernel"].shape[-2]
        gu = checkpoint_name(x2 @ lp["gu"]["kernel"], "fc1_out")
        mlp = (jax.nn.silu(gu[..., :F]) * gu[..., F:]) @ lp["down"]["kernel"]
    else:
        mlp = (jax.nn.silu(checkpoint_name(x2 @ lp["gate"]["kernel"],
                                           "fc1_out"))
               * checkpoint_name(x2 @ lp["up"]["kernel"], "fc1_out")
               ) @ lp["down"]["kernel"]
    return h + _gate(gate_mlp, mlp), (k_fresh, v_fresh)


def dit_forward(cfg: DiffusionHeadConfig, params, h, adaln_input,
                attention_bias, modality_positions, remat: bool = False,
                attn_meta=None, positions=None, cache=None,
                cache_offsets=None, return_kv: bool = False,
                full_span: bool = False):
    """Stack of ModulatedAttentionBlocks as a scan.

    positions: optional [B, S] or [1, S] absolute rope positions (defaults
    to arange).  cache: optional per-layer (ck, cv) [L, B, S_full, Hkv,
    Dh] constant-row K/V buffers with per-row ``cache_offsets`` [B] for
    the fresh rows (t2i cached-window inference).  return_kv=True also
    returns the stacked fresh roped K/V [L, B, S, Hkv, Dh] (the prefill
    pass that builds the cache)."""
    B, S, _ = h.shape
    if positions is None:
        positions = jnp.arange(S)[None, :]
    cos, sin = llama3_rope_tables(positions, cfg)
    attn_impl = None
    if attn_meta is not None and isinstance(attn_meta[0], str):
        attn_impl, attn_meta = attn_meta[0], attn_meta[1:]
    from showo_tpu.utils.remat import wrap_remat

    layer_fn = wrap_remat(_dit_layer, remat, static_argnums=(0, 9, 13))

    # hoist all layers' adaLN projections into ONE einsum (the per-layer
    # [B*M, D] x [D, 6D] matmuls are tiny-M and bandwidth-bound; batching
    # them streams the same 6*D*D*L weights as one contiguous matmul)
    ada_all = (jnp.einsum("bd,ldk->lbk", jax.nn.silu(adaln_input),
                          params["layers"]["adaln"]["kernel"])
               + params["layers"]["adaln"]["bias"][:, None, :])

    if cache is not None:
        def body(h, xs):
            lp, layer_kv, ada = xs
            h, kv = _dit_layer(cfg, lp, h, adaln_input, attention_bias,
                               cos, sin, modality_positions, attn_meta,
                               attn_impl, layer_kv, cache_offsets, ada,
                               full_span)
            return h, kv if return_kv else None

        h, kvs = jax.lax.scan(body, h, (params["layers"], cache, ada_all),
                              unroll=cfg.scan_unroll)
    else:
        def body(h, xs):
            lp, ada = xs
            h, kv = layer_fn(cfg, lp, h, adaln_input, attention_bias, cos,
                             sin, modality_positions, attn_meta, attn_impl,
                             None, None, ada, full_span)
            return h, kv if return_kv else None

        h, kvs = jax.lax.scan(body, h, (params["layers"], ada_all),
                              unroll=cfg.scan_unroll)
    if return_kv:
        return h, kvs
    return h


def init_final_layer_params(hidden: int, patch_size: int, out_channels: int,
                            key, dtype=jnp.float32):
    # zero-init (modeling_showo2_qwen2_5.py:140-143)
    return {
        "norm": {"scale": jnp.ones((hidden,), dtype)},
        "linear": {"kernel": jnp.zeros((hidden, patch_size * patch_size * out_channels), dtype),
                   "bias": jnp.zeros((patch_size * patch_size * out_channels,), dtype)},
        "adaln": {"kernel": jnp.zeros((hidden, 2 * hidden), dtype),
                  "bias": jnp.zeros((2 * hidden,), dtype)},
    }


def final_layer_apply(p, x, adaln_input, modality_positions,
                      rms_eps: float = 1e-6, full_span: bool = False):
    """FinalLayer (modules.py:787-806)."""
    L = x.shape[1]
    ada = jax.nn.silu(adaln_input) @ p["adaln"]["kernel"] + p["adaln"]["bias"]
    (shift, scale), claimed = span_modulation(ada, modality_positions, L,
                                              n_chunks=2, full_span=full_span)
    xn = rms_norm(x, p["norm"]["scale"], rms_eps)
    x = modulate(xn, shift, scale)
    if claimed is not None and shift.shape[1] == 1:
        # M=1 fast path: out-of-span rows pass through unmodulated
        # (bit-identical: modulate(x, 0, 0) == x)
        x = jnp.where(claimed[..., None], x, xn)
    return x @ p["linear"]["kernel"] + p["linear"]["bias"]
