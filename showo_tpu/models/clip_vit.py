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
