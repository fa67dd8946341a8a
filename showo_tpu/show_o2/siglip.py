"""SigLIP vision encoder (semantic tower), TPU-native.

The Show-o2 model uses google/siglip-so400m-patch14-384's vision encoder
minus its last layer as frozen "semantic layers", fed with patch-embedded
VAE latents + the SigLIP position embedding
(show-o2/models/modeling_showo2_qwen2_5.py:77-83).  This module implements
exactly that slice: a pre-LN ViT encoder stack (LayerNorm, biased MHA,
tanh-GELU MLP) over stacked layers with ``lax.scan``, plus bicubic
position-embedding interpolation for dynamic resolution
(show-o2/models/misc.py:305-334).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import layer_norm


@dataclasses.dataclass(frozen=True)
class SigLipConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    num_layers: int = 26          # 27 minus the deleted last layer
    layer_norm_eps: float = 1e-6
    num_positions: int = 729      # 27x27 for so400m-384

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def init_siglip_params(cfg: SigLipConfig, key, dtype=jnp.float32):
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 8)
    n = lambda k, shape, s=0.02: (jax.random.normal(k, shape) * s).astype(dtype)
    z = lambda shape: jnp.zeros(shape, dtype)
    o = lambda shape: jnp.ones(shape, dtype)
    lin = lambda k, i, oo: {"kernel": n(k, (L, i, oo)), "bias": z((L, oo))}
    return {
        "pos_embed": n(ks[7], (cfg.num_positions, D)),
        "layers": {
            "ln1": {"scale": o((L, D)), "bias": z((L, D))},
            "ln2": {"scale": o((L, D)), "bias": z((L, D))},
            "q": lin(ks[0], D, D),
            "k": lin(ks[1], D, D),
            "v": lin(ks[2], D, D),
            "out": lin(ks[3], D, D),
            "fc1": lin(ks[4], D, F),
            "fc2": lin(ks[5], F, D),
        },
    }


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _layer(cfg: SigLipConfig, lp, h):
    B, S, D = h.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    x = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    q = (x @ lp["q"]["kernel"] + lp["q"]["bias"]).reshape(B, S, H, Dh)
    k = (x @ lp["k"]["kernel"] + lp["k"]["bias"]).reshape(B, S, H, Dh)
    v = (x @ lp["v"]["kernel"] + lp["v"]["bias"]).reshape(B, S, H, Dh)
    # bf16 operands + fp32 accumulator: bit-identical to the fp32 upcast
    # without the fp32 operand materialization (see qwen2._layer)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(Dh)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, D)
    h = h + (attn @ lp["out"]["kernel"] + lp["out"]["bias"])

    x2 = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    mlp = _gelu_tanh(x2 @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
    mlp = mlp @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
    return h + mlp


def siglip_encode(cfg: SigLipConfig, params, x, remat=False):
    """x: [B, S, D] patch embeddings (position embedding already added).

    remat matters under grad: without it the 26-layer scan saves every
    layer's fp32 [B, H, S, S] softmax probs (~2.6 GB at B=2, S=729 —
    the dominant stage-1 allocation).  Accepts the utils/remat ladder;
    the named policies (no tags here) degrade to full recompute."""
    from showo_tpu.utils.remat import wrap_remat

    layer_fn = wrap_remat(_layer, remat, static_argnums=(0,))

    def body(h, lp):
        return layer_fn(cfg, lp, h), None

    h, _ = jax.lax.scan(body, x, params["layers"])
    return h


def interpolate_pos_encoding(pos_embed: jnp.ndarray, h: int, w: int):
    """Bicubic 2D interpolation of the [N, D] grid position embedding to
    (h, w) (show-o2/models/misc.py:305-334)."""
    N, D = pos_embed.shape
    side = int(round(math.sqrt(N)))
    grid = pos_embed.reshape(side, side, D)
    out = jax.image.resize(grid, (h, w, D), method="bicubic")
    return out.reshape(1, h * w, D)
