"""CLIP ViT vision tower (frozen), TPU-native.

Implements the reference ``CLIPVisionTower`` (models/clip_encoder.py:6-83):
openai/clip-vit-large-patch14-336 architecture, penultimate-layer features
(``select_layer=-2``) with the CLS token dropped -> 576 patch tokens of
width 1024, which feed Showo's ``mm_projector``.

Pre-LN ViT with quick-GELU MLPs; stacked layers + lax.scan.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipVitConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_heads: int = 16
    num_layers: int = 24
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    select_layer: int = -2   # penultimate

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_vit_params(cfg: ClipVitConfig, key, dtype=jnp.float32):
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 10)
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    o = lambda shape: jnp.ones(shape, dtype)
    lin = lambda k, i, oo: {"kernel": n(k, (L, i, oo)), "bias": z((L, oo))}
    return {
        "patch_embed": {"kernel": n(ks[0], (cfg.patch_size, cfg.patch_size, 3, D))},
        "class_embed": n(ks[1], (D,)),
        "pos_embed": n(ks[2], (cfg.num_patches + 1, D)),
        "pre_ln": {"scale": o((D,)), "bias": z((D,))},
        "layers": {
            "ln1": {"scale": o((L, D)), "bias": z((L, D))},
            "ln2": {"scale": o((L, D)), "bias": z((L, D))},
            "q": lin(ks[3], D, D),
            "k": lin(ks[4], D, D),
            "v": lin(ks[5], D, D),
            "out": lin(ks[6], D, D),
            "fc1": lin(ks[7], D, F),
            "fc2": lin(ks[8], F, D),
        },
    }


def _layer(cfg: ClipVitConfig, lp, h):
    B, S, D = h.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    x = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    q = (x @ lp["q"]["kernel"] + lp["q"]["bias"]).reshape(B, S, H, Dh)
    k = (x @ lp["k"]["kernel"] + lp["k"]["bias"]).reshape(B, S, H, Dh)
    v = (x @ lp["v"]["kernel"] + lp["v"]["bias"]).reshape(B, S, H, Dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) / math.sqrt(Dh)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, D)
    h = h + (attn @ lp["out"]["kernel"] + lp["out"]["bias"])
    x2 = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    mlp = quick_gelu(x2 @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
    return h + (mlp @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])


def clip_vit_features(cfg: ClipVitConfig, params, pixels_nhwc):
    """Penultimate-layer patch features [B, num_patches, D] (no CLS)."""
    B = pixels_nhwc.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixels_nhwc, params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embed"][None, None],
                           (B, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, patches], axis=1) + params["pos_embed"][None]
    h = layer_norm(h, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)

    # run layers up to select_layer (penultimate: all but the last)
    n_run = cfg.num_layers + 1 + cfg.select_layer  # -2 -> N-1 layers
    lp = jax.tree.map(lambda x: x[:n_run], params["layers"])

    def body(h, layer_params):
        return _layer(cfg, layer_params, h), None

    h, _ = jax.lax.scan(body, h, lp)
    return h[:, 1:]  # drop CLS (clip_encoder.py:39-51 patch features)


def _bicubic_matrix(n_in: int, n_out: int) -> "jnp.ndarray":
    """[n_out, n_in] torch-bicubic (a=-0.75, half-pixel, edge-clamped)
    interpolation weights — jax.image's 'cubic' is Catmull-Rom (a=-0.5),
    which does not match torch F.interpolate(mode='bicubic')."""
    import numpy as np
    a = -0.75
    scale = n_in / n_out
    c = (np.arange(n_out) + 0.5) * scale - 0.5
    base = np.floor(c).astype(np.int64)
    frac = c - base
    w = np.zeros((n_out, n_in), np.float32)
    for k in range(-1, 3):
        t = np.abs(frac - k)
        wk = np.where(
            t <= 1, (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0))
        idx = np.clip(base + k, 0, n_in - 1)
        np.add.at(w, (np.arange(n_out), idx), wk.astype(np.float32))
    return jnp.asarray(w)


def _bicubic_resize(x, out_h: int, out_w: int):
    """NHWC resize matching torch F.interpolate(mode='bicubic'), expressed
    as two dense 1-D weight matmuls (static shapes -> MXU-tileable)."""
    B, H, W, C = x.shape
    wh = _bicubic_matrix(H, out_h)
    ww = _bicubic_matrix(W, out_w)
    x = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


def clip_vit_features_s2(cfg: ClipVitConfig, params, pixels_nhwc,
                         scales=None, max_split_size=None):
    """Multiscale (S2) patch features: [B, num_patches, D * len(scales)].

    Implements the reference ``CLIPVisionTowerS2``
    (models/clip_encoder.py:85-140), whose multiscale loop comes from the
    external ``s2wrapper.forward`` package: for each scale the image is
    bicubic-resized, chess-board split into tiles of ``max_split_size``,
    each tile run through the tower, the tile feature maps merged back
    spatially, area-pooled down to the smallest scale's feature grid, and
    the per-scale maps concatenated on the channel axis
    (``hidden_size * len(s2_scales)``, clip_encoder.py:139-140).

    All tiles across all scales run as ONE batched tower forward (1+4+9
    tiles at the default 336/672/1008 scales) so the MXU sees a single
    large batch instead of three sequential calls.
    """
    B, H0, W0, C = pixels_nhwc.shape
    scales = sorted(scales or (cfg.image_size, 2 * cfg.image_size,
                               3 * cfg.image_size))
    split = int(max_split_size or scales[0])

    tiles_per_scale, all_tiles = [], []
    for s in scales:
        n = math.ceil(s / split)
        t = s // n
        x = pixels_nhwc
        if (H0, W0) != (s, s):
            x = _bicubic_resize(pixels_nhwc, s, s).astype(pixels_nhwc.dtype)
        # split_chessboard: row-major (i, j) tiles stacked on batch,
        # tile-major with the original batch innermost
        tiles = x.reshape(B, n, t, n, t, C).transpose(1, 3, 0, 2, 4, 5)
        all_tiles.append(tiles.reshape(n * n * B, t, t, C))
        tiles_per_scale.append(n)

    feats = clip_vit_features(cfg, params, jnp.concatenate(all_tiles, 0))
    p = int(round(math.sqrt(feats.shape[1])))
    D = feats.shape[-1]

    out, off = [], 0
    base = p  # output grid = smallest scale's (s2wrapper resize_output_to_idx=0)
    for n in tiles_per_scale:
        f = feats[off:off + n * n * B]
        off += n * n * B
        # merge_chessboard: tile (i, j) -> block row i, col j
        f = f.reshape(n, n, B, p, p, D).transpose(2, 0, 3, 1, 4, 5)
        f = f.reshape(B, n * p, n * p, D)
        factor = (n * p) // base
        assert factor * base == n * p, (
            f"s2 scales must be integer multiples of the base scale "
            f"(merged grid {n * p} vs base {base})")
        # torch 'area' interpolation at an integer factor is exact mean-pool
        f = f.reshape(B, base, factor, base, factor, D).mean(axis=(2, 4))
        out.append(f)
    return jnp.concatenate(out, axis=-1).reshape(B, base * base,
                                                 D * len(scales))
