"""Semantic-layer distillation model (show-o2/models/modeling_semantic_layers.py).

Pre-distills ``image_embedder_und`` + ``und_trans`` so patch-embedded VAE
latents mimic SigLIP pixel features: cosine-similarity ``-log(sim)`` loss
(:86-99).  The distilled weights are loaded into Showo2 before stage-1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from showo_tpu.show_o2.dit import patch_embed_apply
from showo_tpu.show_o2.showo2 import Showo2Config
from showo_tpu.show_o2.siglip import interpolate_pos_encoding, siglip_encode


def semantic_layer_features(cfg: Showo2Config, params: Dict[str, Any],
                            latents_nchw: jnp.ndarray) -> jnp.ndarray:
    """VAE latents -> und features through patch embed + SigLIP layers."""
    x = jnp.transpose(latents_nchw, (0, 2, 3, 1))
    und = patch_embed_apply(params["image_embedder_und"], x, cfg.patch_size)
    h_, w_ = x.shape[1] // cfg.patch_size, x.shape[2] // cfg.patch_size
    pos = params["und_trans"]["pos_embed"]
    if pos.shape[0] == h_ * w_:
        und = und + pos[None]
    else:
        und = und + interpolate_pos_encoding(pos, h_, w_)
    return siglip_encode(cfg.siglip, params["und_trans"], und)


def distillation_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      eps: float = 1e-8) -> jnp.ndarray:
    """-log(cosine_similarity) averaged over tokens
    (modeling_semantic_layers.py:86-99)."""
    pn = pred / jnp.clip(jnp.linalg.norm(pred, axis=-1, keepdims=True), eps)
    tn = target / jnp.clip(jnp.linalg.norm(target, axis=-1, keepdims=True), eps)
    sim = jnp.sum(pn * tn, axis=-1)
    return -jnp.log(jnp.clip((sim + 1.0) / 2.0, eps)).mean()


def make_distill_step(cfg: Showo2Config, optimizer):
    """Jitted step: (params, opt_state, latents, target_feats) -> update."""
    import optax

    def step(params, opt_state, latents, target):
        def loss_fn(p):
            pred = semantic_layer_features(cfg, p, latents)
            return distillation_loss(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
