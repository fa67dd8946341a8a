"""Wan2.1 3D causal VAE, TPU-native (full-clip formulation).

The reference (show-o2/models/wan21_vae.py) streams 1+4k pixel-frame chunks
through the encoder and single latent frames through the decoder, threading
per-conv ``feat_cache`` of the last CACHE_T=2 frames so chunk boundaries
see the right history.  On TPU we process the whole clip in one compiled
program; the cache semantics reduce exactly to:

  * stride-1 CausalConv3d  -> standard conv with 2*pad left zero-padding in
    time (wan21_vae.py:17-36);
  * downsample3d time path -> frame 0 passes through untouched, frames from
    0 on feed a kernel-3 stride-2 no-pad conv whose first window is
    [f0,f1,f2] (derived from the i=0 cache bootstrap at :143-159);
  * upsample3d time path   -> frame 0 passes through, frames 1..T-1 feed a
    causal (left zero-pad 2, frame 0 EXCLUDED) conv producing 2C channels
    interleaved into 2 output frames each ('Rep' bootstrap at :103-137).

Numerics (RMS_norm = channel-L2 * sqrt(C) * gamma, single-head spatial
attention with zero-init proj, SiLU/residual ordering) follow the
reference exactly; verified by golden tests.

Layout: (B, T, H, W, C) internally; the public API takes/returns the
reference's (B, C, T, H, W).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))


# latent normalization constants (wan21_vae.py:632-642)
WAN_LATENT_MEAN = jnp.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921])
WAN_LATENT_STD = jnp.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160])


# ---------------------------------------------------------------------------
# primitive layers (params are dicts of arrays)
# ---------------------------------------------------------------------------

def causal_conv3d(p, x, stride_t: int = 1, causal_pad: bool = True):
    """x: [B, T, H, W, C]; kernel [kT, kH, kW, I, O]; time pad 2*(kT//2)
    on the left, spatial symmetric."""
    x = x.astype(p["kernel"].dtype)
    kT, kH, kW = p["kernel"].shape[:3]
    pad_t = (2 * (kT // 2), 0) if causal_pad else (0, 0)
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride_t, 1, 1),
        padding=(pad_t, (kH // 2, kH // 2), (kW // 2, kW // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["bias"]


def conv2d(p, x, stride: int = 1, pad: int = 1):
    x = x.astype(p["kernel"].dtype)
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def rms_norm_channel(p, x):
    """L2-normalize over channels * sqrt(C) * gamma (+bias)
    (wan21_vae.py:39-54); channel-last layout here."""
    C = x.shape[-1]
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    y = x / jnp.maximum(norm, 1e-12) * math.sqrt(C) * p["gamma"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _residual_block(p, x):
    """RMS->SiLU->conv->RMS->SiLU->conv + shortcut (wan21_vae.py:186-220)."""
    h = rms_norm_channel(p["norm1"], x)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv1"], h)
    h = rms_norm_channel(p["norm2"], h)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv2"], h)
    sc = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return sc + h


def _attention_block(p, x):
    """Per-frame single-head spatial attention (wan21_vae.py:223-262)."""
    B, T, H, W, C = x.shape
    flat = x.reshape(B * T, H, W, C)
    h = rms_norm_channel(p["norm"], flat)
    qkv = conv2d(p["to_qkv"], h, pad=0)  # [BT, H, W, 3C]
    q, k, v = jnp.split(qkv.reshape(B * T, H * W, 3 * C), 3, axis=-1)
    scores = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(C)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bij,bjc->bic", probs, v).reshape(B * T, H, W, C)
    out = conv2d(p["proj"], out, pad=0)
    return x + out.reshape(B, T, H, W, C)


def _spatial_resample_down(p, x):
    """ZeroPad2d (0,1,0,1) + conv stride 2, per frame."""
    B, T, H, W, C = x.shape
    flat = x.reshape(B * T, H, W, C)
    flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        flat, p["kernel"], window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
    return out.reshape(B, T, H // 2, W // 2, -1)


def _spatial_resample_up(p, x):
    """nearest-exact 2x + conv3x3 (halves channels), per frame."""
    B, T, H, W, C = x.shape
    flat = x.reshape(B * T, H, W, C)
    flat = jax.image.resize(flat, (B * T, H * 2, W * 2, C), method="nearest")
    out = conv2d(p, flat, pad=1)
    return out.reshape(B, T, H * 2, W * 2, -1)


def _time_downsample(p, x):
    """downsample3d temporal part, full-clip equivalent (see module doc)."""
    B, T, H, W, C = x.shape
    if T == 1:
        return x
    conv = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(2, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    return jnp.concatenate([x[:, :1], conv], axis=1)


def _time_upsample(p, x):
    """upsample3d temporal part, full-clip equivalent (see module doc).
    kernel [3,1,1,C,2C]; frames 1.. get causal conv then channel->time
    interleave."""
    B, T, H, W, C = x.shape
    if T == 1:
        return x
    rest = x[:, 1:]  # frame 0 excluded from the temporal conv
    conv = jax.lax.conv_general_dilated(
        rest, p["kernel"], window_strides=(1, 1, 1),
        padding=((2, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    # 2C channels -> 2 frames: torch reshape(b, 2, c, t, h, w) then stack
    # on the time axis; channel-last equivalent:
    Tm1 = T - 1
    conv = conv.reshape(B, Tm1, H, W, 2, C)
    conv = jnp.moveaxis(conv, 4, 2).reshape(B, Tm1 * 2, H, W, C)
    return jnp.concatenate([x[:, :1], conv], axis=1)


# ---------------------------------------------------------------------------
# encoder / decoder stacks
# ---------------------------------------------------------------------------

def encoder_structure(cfg: WanVAEConfig) -> List[Tuple[str, dict]]:
    """Static plan of the encoder's downsamples sequence."""
    plan = []
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_dim
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", {"in": d, "out": out_dim}))
            d = out_dim
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            plan.append((mode, {"dim": out_dim}))
    return plan


def decoder_structure(cfg: WanVAEConfig) -> List[Tuple[str, dict]]:
    plan = []
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_dim // 2 if i in (1, 2, 3) else in_dim
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", {"in": d, "out": out_dim}))
            d = out_dim
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            plan.append((mode, {"dim": out_dim}))
    return plan


def _init_conv3d(key, kT, kH, kW, i, o, dtype):
    fan_in = kT * kH * kW * i
    s = 1.0 / math.sqrt(fan_in)
    return {"kernel": (jax.random.uniform(key, (kT, kH, kW, i, o),
                                          minval=-s, maxval=s)).astype(dtype),
            "bias": jnp.zeros((o,), dtype)}


def _init_conv2d(key, kH, kW, i, o, dtype):
    fan_in = kH * kW * i
    s = 1.0 / math.sqrt(fan_in)
    return {"kernel": (jax.random.uniform(key, (kH, kW, i, o),
                                          minval=-s, maxval=s)).astype(dtype),
            "bias": jnp.zeros((o,), dtype)}


def _init_res(key, i, o, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((i,), dtype)},
        "conv1": _init_conv3d(ks[0], 3, 3, 3, i, o, dtype),
        "norm2": {"gamma": jnp.ones((o,), dtype)},
        "conv2": _init_conv3d(ks[1], 3, 3, 3, o, o, dtype),
    }
    if i != o:
        p["shortcut"] = _init_conv3d(ks[2], 1, 1, 1, i, o, dtype)
    return p


def _init_attn(key, d, dtype):
    ks = jax.random.split(key, 2)
    p = {
        "norm": {"gamma": jnp.ones((d,), dtype)},
        "to_qkv": _init_conv2d(ks[0], 1, 1, d, 3 * d, dtype),
        "proj": _init_conv2d(ks[1], 1, 1, d, d, dtype),
    }
    p["proj"]["kernel"] = jnp.zeros_like(p["proj"]["kernel"])
    return p


def init_wan_vae_params(cfg: WanVAEConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    out_dim_enc = cfg.dim * cfg.dim_mult[-1]

    enc: Dict[str, Any] = {"conv1": _init_conv3d(nk(), 3, 3, 3, 3, cfg.dim, dtype)}
    for idx, (kind, meta) in enumerate(encoder_structure(cfg)):
        if kind == "res":
            enc[f"b{idx}"] = _init_res(nk(), meta["in"], meta["out"], dtype)
        elif kind == "downsample2d":
            enc[f"b{idx}"] = {"conv": _init_conv2d(nk(), 3, 3, meta["dim"], meta["dim"], dtype)}
        else:  # downsample3d
            enc[f"b{idx}"] = {
                "conv": _init_conv2d(nk(), 3, 3, meta["dim"], meta["dim"], dtype),
                "time": _init_conv3d(nk(), 3, 1, 1, meta["dim"], meta["dim"], dtype),
            }
    enc["mid_res1"] = _init_res(nk(), out_dim_enc, out_dim_enc, dtype)
    enc["mid_attn"] = _init_attn(nk(), out_dim_enc, dtype)
    enc["mid_res2"] = _init_res(nk(), out_dim_enc, out_dim_enc, dtype)
    enc["head_norm"] = {"gamma": jnp.ones((out_dim_enc,), dtype)}
    enc["head_conv"] = _init_conv3d(nk(), 3, 3, 3, out_dim_enc, 2 * cfg.z_dim, dtype)

    dec_in = cfg.dim * cfg.dim_mult[-1]
    dec: Dict[str, Any] = {"conv1": _init_conv3d(nk(), 3, 3, 3, cfg.z_dim, dec_in, dtype)}
    dec["mid_res1"] = _init_res(nk(), dec_in, dec_in, dtype)
    dec["mid_attn"] = _init_attn(nk(), dec_in, dtype)
    dec["mid_res2"] = _init_res(nk(), dec_in, dec_in, dtype)
    for idx, (kind, meta) in enumerate(decoder_structure(cfg)):
        if kind == "res":
            dec[f"b{idx}"] = _init_res(nk(), meta["in"], meta["out"], dtype)
        elif kind == "upsample2d":
            dec[f"b{idx}"] = {"conv": _init_conv2d(nk(), 3, 3, meta["dim"], meta["dim"] // 2, dtype)}
        else:  # upsample3d
            dec[f"b{idx}"] = {
                "conv": _init_conv2d(nk(), 3, 3, meta["dim"], meta["dim"] // 2, dtype),
                "time": _init_conv3d(nk(), 3, 1, 1, meta["dim"], 2 * meta["dim"], dtype),
            }
    last = cfg.dim
    dec["head_norm"] = {"gamma": jnp.ones((last,), dtype)}
    dec["head_conv"] = _init_conv3d(nk(), 3, 3, 3, last, 3, dtype)

    return {
        "encoder": enc,
        "conv1": _init_conv3d(nk(), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim, dtype),
        "conv2": _init_conv3d(nk(), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
        "decoder": dec,
    }


def wan_encode_raw(cfg: WanVAEConfig, params, x):
    """x: [B, T, H, W, 3] -> (mu, log_var) in [B, T', H/8, W/8, z]."""
    enc = params["encoder"]
    h = causal_conv3d(enc["conv1"], x)
    for idx, (kind, meta) in enumerate(encoder_structure(cfg)):
        p = enc[f"b{idx}"]
        if kind == "res":
            h = _residual_block(p, h)
        elif kind == "downsample2d":
            h = _spatial_resample_down(p["conv"], h)
        else:
            h = _spatial_resample_down(p["conv"], h)
            h = _time_downsample(p["time"], h)
    h = _residual_block(enc["mid_res1"], h)
    h = _attention_block(enc["mid_attn"], h)
    h = _residual_block(enc["mid_res2"], h)
    h = rms_norm_channel(enc["head_norm"], h)
    h = jax.nn.silu(h)
    h = causal_conv3d(enc["head_conv"], h)
    h = causal_conv3d(params["conv1"], h)
    mu, log_var = jnp.split(h, 2, axis=-1)
    return mu, log_var


def wan_decode_raw(cfg: WanVAEConfig, params, z):
    """z: [B, T, H', W', z_dim] -> [B, 4(T-1)+1, 8H', 8W', 3]."""
    dec = params["decoder"]
    h = causal_conv3d(params["conv2"], z)
    h = causal_conv3d(dec["conv1"], h)
    h = _residual_block(dec["mid_res1"], h)
    h = _attention_block(dec["mid_attn"], h)
    h = _residual_block(dec["mid_res2"], h)
    for idx, (kind, meta) in enumerate(decoder_structure(cfg)):
        p = dec[f"b{idx}"]
        if kind == "res":
            h = _residual_block(p, h)
        elif kind == "upsample2d":
            h = _spatial_resample_up(p["conv"], h)
        else:
            h = _time_upsample(p["time"], h)
            h = _spatial_resample_up(p["conv"], h)
    h = rms_norm_channel(dec["head_norm"], h)
    h = jax.nn.silu(h)
    return causal_conv3d(dec["head_conv"], h)


# ---------------------------------------------------------------------------
# WanVAE facade (wan21_vae.py:622-689): scale-normalized latents
# ---------------------------------------------------------------------------

def _to_tlast(x_nchw):   # [B, C, T, H, W] -> [B, T, H, W, C]
    return jnp.transpose(x_nchw, (0, 2, 3, 4, 1))


def _to_cfirst(x):       # [B, T, H, W, C] -> [B, C, T, H, W]
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def wan_encode(cfg: WanVAEConfig, params, videos_ncthw, key=None,
               deterministic: bool = False):
    """`WanVAE.sample`: reparameterized, scale-normalized latents."""
    mu, log_var = wan_encode_raw(cfg, params, _to_tlast(videos_ncthw))
    mu = (mu - WAN_LATENT_MEAN) / WAN_LATENT_STD
    if deterministic:
        return _to_cfirst(mu)
    std = jnp.exp(0.5 * jnp.clip(log_var, -30.0, 20.0))
    eps = jax.random.normal(key, std.shape, std.dtype)
    return _to_cfirst(mu + std * eps)


def wan_decode(cfg: WanVAEConfig, params, z_ncthw):
    """`WanVAE.batch_decode`: denormalize and decode, clamp to [-1, 1]."""
    z = _to_tlast(z_ncthw) * WAN_LATENT_STD + WAN_LATENT_MEAN
    x = wan_decode_raw(cfg, params, z)
    return jnp.clip(_to_cfirst(x), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Streaming (chunked) mode — constant-memory equivalents of the reference's
# feat_cache threading (wan21_vae.py:516-568 chunked encode / per-frame
# decode, cache mechanics :101-160).
#
# TPU-first formulation: instead of the reference's imperative per-conv
# list-of-tensors cache, the temporal state is a *pytree of fixed-shape
# per-conv buffers* carried through ``jax.lax.scan`` over fixed-size
# chunks (4 pixel frames in, 1 latent frame; 1 latent frame in, 4 pixel
# frames out).  One compiled program per phase (bootstrap + scan body),
# static shapes, activation memory constant in T.
#
# Exactness notes (verified by tests/test_wan_vae_streaming.py parity
# against the full-clip formulation):
#   * stride-1 CausalConv3d left-pads 2 zeros; a zero-initialized 2-frame
#     cache concatenated in front of each chunk reproduces every window,
#     including the reference's None->1-frame-cache bootstrap (the missing
#     second frame is the zero the left pad would have supplied);
#   * downsample3d: chunk 0 passes through and seeds the 1-frame cache
#     with the real frame (wan21_vae.py:145-160);
#   * upsample3d: chunk 0 passes through ('Rep' bootstrap :103-137); a
#     zero-initialized 2-frame cache reproduces both the 'Rep' zero-pad
#     chunk and all later prev-frame chunks.
# ---------------------------------------------------------------------------


def _cc3d_stream(p, x, caches, name):
    """Streaming stride-1 causal conv: 2-frame carried cache (kT == 3)."""
    kT, kH, kW = p["kernel"].shape[:3]
    if kT == 1:
        return causal_conv3d(p, x), caches
    x = x.astype(p["kernel"].dtype)
    cache = caches.get(name)
    if cache is None:
        cache = jnp.zeros((x.shape[0], 2) + x.shape[2:], x.dtype)
    inp = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    out = jax.lax.conv_general_dilated(
        inp, p["kernel"], window_strides=(1, 1, 1),
        padding=((0, 0), (kH // 2, kH // 2), (kW // 2, kW // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    caches = dict(caches, **{name: inp[:, -2:]})
    return out, caches


def _res_stream(p, x, caches, name):
    h = rms_norm_channel(p["norm1"], x)
    h = jax.nn.silu(h)
    h, caches = _cc3d_stream(p["conv1"], h, caches, name + "/c1")
    h = rms_norm_channel(p["norm2"], h)
    h = jax.nn.silu(h)
    h, caches = _cc3d_stream(p["conv2"], h, caches, name + "/c2")
    sc = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return sc + h, caches


def _time_down_stream(p, x, caches, name, first: bool):
    if first:  # chunk 0: passthrough, seed the 1-frame cache (real frame)
        return x, dict(caches, **{name: x[:, -1:]})
    cache = caches[name]
    inp = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    out = jax.lax.conv_general_dilated(
        inp, p["kernel"], window_strides=(2, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    return out, dict(caches, **{name: inp[:, -1:]})


def _time_up_stream(p, x, caches, name, first: bool):
    B, T, H, W, C = x.shape
    if first:  # chunk 0: passthrough ('Rep'), zero 2-frame cache
        cache = jnp.zeros((B, 2, H, W, C), p["kernel"].dtype)
        return x, dict(caches, **{name: cache})
    cache = caches[name]
    inp = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    conv = jax.lax.conv_general_dilated(
        inp, p["kernel"], window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    conv = conv.reshape(B, T, H, W, 2, C)
    conv = jnp.moveaxis(conv, 4, 2).reshape(B, T * 2, H, W, C)
    return conv, dict(caches, **{name: inp[:, -2:]})


def _encoder_chunk(cfg: WanVAEConfig, params, x, caches, first: bool):
    """One encoder chunk ([B,1,...] bootstrap / [B,4,...] steady state)
    -> pre-facade latent chunk + updated caches."""
    enc = params["encoder"]
    caches = dict(caches or {})
    h, caches = _cc3d_stream(enc["conv1"], x, caches, "conv1")
    for idx, (kind, _meta) in enumerate(encoder_structure(cfg)):
        p = enc[f"b{idx}"]
        name = f"b{idx}"
        if kind == "res":
            h, caches = _res_stream(p, h, caches, name)
        elif kind == "downsample2d":
            h = _spatial_resample_down(p["conv"], h)
        else:
            h = _spatial_resample_down(p["conv"], h)
            h, caches = _time_down_stream(p["time"], h, caches,
                                          name + "/t", first)
    h, caches = _res_stream(enc["mid_res1"], h, caches, "mid1")
    h = _attention_block(enc["mid_attn"], h)
    h, caches = _res_stream(enc["mid_res2"], h, caches, "mid2")
    h = rms_norm_channel(enc["head_norm"], h)
    h = jax.nn.silu(h)
    h, caches = _cc3d_stream(enc["head_conv"], h, caches, "head")
    return h, caches


def _decoder_chunk(cfg: WanVAEConfig, params, z, caches, first: bool):
    """One decoder chunk ([B,1,...] latent frame) -> pixel frames
    ([B,1,...] bootstrap / [B,4,...] steady state) + updated caches."""
    dec = params["decoder"]
    caches = dict(caches or {})
    h, caches = _cc3d_stream(dec["conv1"], z, caches, "conv1")
    h, caches = _res_stream(dec["mid_res1"], h, caches, "mid1")
    h = _attention_block(dec["mid_attn"], h)
    h, caches = _res_stream(dec["mid_res2"], h, caches, "mid2")
    for idx, (kind, _meta) in enumerate(decoder_structure(cfg)):
        p = dec[f"b{idx}"]
        name = f"b{idx}"
        if kind == "res":
            h, caches = _res_stream(p, h, caches, name)
        elif kind == "upsample2d":
            h = _spatial_resample_up(p["conv"], h)
        else:
            h, caches = _time_up_stream(p["time"], h, caches,
                                        name + "/t", first)
            h = _spatial_resample_up(p["conv"], h)
    h = rms_norm_channel(dec["head_norm"], h)
    h = jax.nn.silu(h)
    h, caches = _cc3d_stream(dec["head_conv"], h, caches, "head")
    return h, caches


def _temporal_factor(cfg: WanVAEConfig) -> int:
    """Pixel frames per latent frame = 2^(#temporal downsamples)."""
    return 2 ** sum(bool(d) for d in cfg.temperal_downsample)


def wan_encode_raw_streaming(cfg: WanVAEConfig, params, x):
    """Chunked encode: x [B, T, H, W, 3] with T = 1 + f*k (f = temporal
    factor, 4 for the shipped config) -> (mu, log_var).  Bit-equal to
    wan_encode_raw; activation memory constant in T."""
    B, T = x.shape[:2]
    f = _temporal_factor(cfg)
    assert (T - 1) % f == 0, f"streaming encode needs T = 1+{f}k, got {T}"
    out0, caches = _encoder_chunk(cfg, params, x[:, :1], None, first=True)
    k = (T - 1) // f
    if k:
        chunks = jnp.moveaxis(
            x[:, 1:].reshape(B, k, f, *x.shape[2:]), 1, 0)

        def body(caches, xc):
            out, caches = _encoder_chunk(cfg, params, xc, caches, first=False)
            return caches, out

        _, outs = jax.lax.scan(body, caches, chunks)
        # [k, B, 1, h, w, C] -> [B, k, h, w, C]
        outs = jnp.moveaxis(outs[:, :, 0], 0, 1)
        h = jnp.concatenate([out0, outs], axis=1)
    else:
        h = out0
    h = causal_conv3d(params["conv1"], h)
    mu, log_var = jnp.split(h, 2, axis=-1)
    return mu, log_var


def wan_decode_raw_streaming(cfg: WanVAEConfig, params, z):
    """Per-latent-frame decode: z [B, T', h, w, z_dim] ->
    [B, 4(T'-1)+1, 8h, 8w, 3].  Bit-equal to wan_decode_raw."""
    B, Tz = z.shape[:2]
    h = causal_conv3d(params["conv2"], z)
    out0, caches = _decoder_chunk(cfg, params, h[:, :1], None, first=True)
    if Tz > 1:
        frames = jnp.moveaxis(h[:, 1:, None], 1, 0)  # [T'-1, B, 1, h, w, C]

        def body(caches, zc):
            out, caches = _decoder_chunk(cfg, params, zc, caches, first=False)
            return caches, out

        _, outs = jax.lax.scan(body, caches, frames)
        # [T'-1, B, 4, H, W, 3] -> [B, 4(T'-1), H, W, 3]
        outs = jnp.moveaxis(outs, 0, 1).reshape(B, -1, *outs.shape[3:])
        return jnp.concatenate([out0, outs], axis=1)
    return out0


def wan_encode_streaming(cfg: WanVAEConfig, params, videos_ncthw, key=None,
                         deterministic: bool = False):
    """`WanVAE.sample` in chunked-streaming mode (constant memory in T)."""
    mu, log_var = wan_encode_raw_streaming(cfg, params,
                                           _to_tlast(videos_ncthw))
    mu = (mu - WAN_LATENT_MEAN) / WAN_LATENT_STD
    if deterministic:
        return _to_cfirst(mu)
    std = jnp.exp(0.5 * jnp.clip(log_var, -30.0, 20.0))
    eps = jax.random.normal(key, std.shape, std.dtype)
    return _to_cfirst(mu + std * eps)


def wan_decode_streaming(cfg: WanVAEConfig, params, z_ncthw):
    """`WanVAE.batch_decode` in per-frame streaming mode."""
    z = _to_tlast(z_ncthw) * WAN_LATENT_STD + WAN_LATENT_MEAN
    x = wan_decode_raw_streaming(cfg, params, z)
    return jnp.clip(_to_cfirst(x), -1.0, 1.0)
