"""Training-time discrete forward process (mask/replace corruption).

Vectorized on-device port of training/utils.py:77-154
``mask_or_random_replace_tokens``: timestep ~ U(0,1) -> mask_prob =
schedule(t).clip(min_rate); mask round(seq*p) tokens chosen by random
permutation threshold; optional contiguous-rectangle masking; noise_type
"mask" or "random_replace"; labels -100 outside the masked set unless
``predict_all_tokens``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def get_loss_weight(t, mask, min_val=0.3):
    """training/utils.py:73-74."""
    return 1 - (1 - mask) * ((1 - t) * (1 - min_val))[:, None]


def mask_or_random_replace_tokens(
    key: jax.Array,
    image_tokens: jnp.ndarray,
    mask_id: int,
    mask_schedule: Callable,
    *,
    min_masking_rate: float = 0.0,
    noise_type: str = "mask",
    predict_all_tokens: bool = False,
    mask_contiguous_region_prob: Optional[float] = None,
    codebook_size: int = 8192,
    eval_mask_ratios: Optional[jnp.ndarray] = None,
    is_train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (input_ids, labels, loss_weight_or_None, mask_prob).

    image_tokens: [B, S] codebook-space tokens.
    """
    B, S = image_tokens.shape
    k_t, k_perm, k_contig, k_choice, k_replace = jax.random.split(key, 5)

    if not is_train and eval_mask_ratios is not None:
        idx = jax.random.randint(k_t, (B,), 0, len(eval_mask_ratios))
        mask_prob = eval_mask_ratios[idx]
        timesteps = mask_prob
    else:
        timesteps = jax.random.uniform(k_t, (B,))
        mask_prob = mask_schedule(timesteps)
        mask_prob = jnp.clip(mask_prob, min_masking_rate)

    num_token_masked = jnp.clip(jnp.round(S * mask_prob), 1, None)

    # random-permutation threshold masking (utils.py:101-105)
    batch_randperm = jax.random.uniform(k_perm, (B, S)).argsort(axis=-1)
    mask_random = batch_randperm < num_token_masked[:, None]

    if mask_contiguous_region_prob:
        # contiguous rectangle of ~mask_prob area on the sqrt(S) grid
        side = int(round(S ** 0.5))
        # per-batch rectangle (vectorized analogue of utils.py:107-127):
        # sample height/width ~ area, random top-left corner
        k_h, k_r, k_c, k_sel = jax.random.split(k_contig, 4)
        num_masked = num_token_masked.astype(jnp.int32)
        h = jnp.clip(jnp.sqrt(num_masked.astype(jnp.float32)).astype(jnp.int32),
                     1, side)
        w = jnp.clip(num_masked // jnp.maximum(h, 1), 1, side)
        r0 = jax.random.randint(k_r, (B,), 0, side) % jnp.maximum(side - h + 1, 1)
        c0 = jax.random.randint(k_c, (B,), 0, side) % jnp.maximum(side - w + 1, 1)
        rows = jnp.arange(side)[None, :, None]
        cols = jnp.arange(side)[None, None, :]
        rect = ((rows >= r0[:, None, None]) & (rows < (r0 + h)[:, None, None]) &
                (cols >= c0[:, None, None]) & (cols < (c0 + w)[:, None, None]))
        mask_contig = rect.reshape(B, S)
        use_contig = jax.random.uniform(k_sel, ()) < mask_contiguous_region_prob
        mask = jnp.where(use_contig, mask_contig, mask_random)
    else:
        mask = mask_random

    if noise_type == "mask":
        noised = jnp.where(mask, mask_id, image_tokens)
    elif noise_type == "random_replace":
        random_tokens = jax.random.randint(k_replace, image_tokens.shape, 0,
                                           codebook_size)
        noised = jnp.where(mask, random_tokens, image_tokens)
    else:
        raise ValueError(f"unknown noise_type {noise_type}")

    if predict_all_tokens:
        labels = image_tokens
        loss_weight = get_loss_weight(timesteps, mask.astype(jnp.float32))
    else:
        labels = jnp.where(mask, image_tokens, -100)
        loss_weight = None

    return noised, labels, loss_weight, mask_prob
