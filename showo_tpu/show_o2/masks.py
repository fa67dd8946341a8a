"""Show-o2 omni attention: causal ∪ per-modality full blocks, vectorized.

Semantics of show-o2/models/omni_attention.py:56-70 ``omni_attn_mask_naive``
(the path actually used by the reference trainers/inference — BlockMask is
bypassed as less stable, train_stage_one.py:423-432): tril base, then each
(offset, length) span from ``modality_positions`` is made fully
bidirectional within itself.

Here the builder is pure jnp over [B, M, 2] modality positions — no python
loops, no host sync — so it lives inside the compiled step.  A (0, 0)
padding entry contributes nothing (length 0 span is empty).
"""

from __future__ import annotations

import jax.numpy as jnp

from showo_tpu.ops.masks import NEG_INF, to_additive


def omni_attn_mask(modality_positions: jnp.ndarray, L: int,
                   inverted: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """[B, M, 2] (offset, length) spans -> [B, 1, L, L] mask.

    inverted=True returns the additive form (0 visible / NEG_INF hidden).
    """
    B, M, _ = modality_positions.shape
    i = jnp.arange(L)[None, :, None, None]  # [1, L, 1, 1]
    j = jnp.arange(L)[None, None, :, None]  # [1, 1, L, 1]
    off = modality_positions[:, None, None, :, 0]  # [B, 1, 1, M]
    length = modality_positions[:, None, None, :, 1]
    in_i = (i >= off) & (i < off + length)
    in_j = (j >= off) & (j < off + length)
    block = jnp.any(in_i & in_j, axis=-1)  # [B, L, L]
    causal = jnp.tril(jnp.ones((L, L), bool))[None]
    mask = (causal | block)[:, None]  # [B, 1, L, L]
    if inverted:
        return to_additive(mask, dtype)
    return mask


def full_attn_mask(B: int, L: int, inverted: bool = True, dtype=jnp.float32):
    """show-o2/models/omni_attention.py:73-80."""
    mask = jnp.ones((B, 1, L, L), bool)
    return to_additive(mask, dtype) if inverted else mask


def causal_attn_mask(B: int, L: int, inverted: bool = True, dtype=jnp.float32):
    """show-o2/models/omni_attention.py:83-93."""
    mask = jnp.broadcast_to(jnp.tril(jnp.ones((L, L), bool))[None, None],
                            (B, 1, L, L))
    return to_additive(mask, dtype) if inverted else mask


def modality_scatter(input_embeds: jnp.ndarray,
                     image_embeds: jnp.ndarray,
                     time_embeds: jnp.ndarray | None,
                     modality_positions: jnp.ndarray,
                     add_time_embeds: bool = True) -> jnp.ndarray:
    """Scatter per-image embeddings (and a leading time-embed token) into
    the text-token slots given by modality_positions.

    Vectorized replacement for the per-sample python loops at
    modeling_showo2_qwen2_5.py:350-371.

    input_embeds: [B, L, D]; image_embeds: [B*M, N, D] (N = tokens per
    image, excluding the time slot); time_embeds: [B*M, D];
    modality_positions: [B, M, 2].
    Returns the updated [B, L, D].
    """
    B, L, D = input_embeds.shape
    M = modality_positions.shape[1]
    N = image_embeds.shape[1]

    pos = jnp.arange(L)[None, :, None]             # [1, L, 1]
    off = modality_positions[:, None, :, 0]        # [B, 1, M]
    length = modality_positions[:, None, :, 1]     # [B, 1, M]

    if add_time_embeds:
        # reference quirk kept: the time slot is written unconditionally,
        # so a (0,0) padding entry clobbers position 0 with its time embed
        # (modeling_showo2_qwen2_5.py:353)
        is_time = pos == off                                     # [B, L, M]
        in_img = (pos > off) & (pos < off + length)              # [B, L, M]
        tok_idx = pos - off - 1
    else:
        is_time = jnp.zeros((B, L, M), bool)
        in_img = (pos >= off) & (pos < off + length)
        tok_idx = pos - off

    # which span (if any) claims each position; later spans win, matching
    # the reference's sequential overwrites
    span_id = jnp.argmax(
        jnp.where(is_time | in_img, jnp.arange(M)[None, None, :] + 1, 0),
        axis=-1)                                                  # [B, L]
    claimed_time = jnp.take_along_axis(is_time, span_id[:, :, None],
                                       axis=-1)[..., 0]
    claimed_img = jnp.take_along_axis(in_img, span_id[:, :, None],
                                      axis=-1)[..., 0]
    tok = jnp.take_along_axis(tok_idx, span_id[:, :, None], axis=-1)[..., 0]

    flat_idx = jnp.arange(B)[:, None] * M + span_id               # [B, L]
    tok = jnp.clip(tok, 0, N - 1)
    gathered_img = image_embeds[flat_idx, tok]                    # [B, L, D]

    out = jnp.where(claimed_img[..., None], gathered_img, input_embeds)
    if add_time_embeds and time_embeds is not None:
        gathered_time = time_embeds[flat_idx]                     # [B, L, D]
        out = jnp.where(claimed_time[..., None], gathered_time, out)
    return out


def modality_gather(x: jnp.ndarray, modality_positions: jnp.ndarray,
                    num_tokens: int) -> jnp.ndarray:
    """Extract per-image token runs [B*M, num_tokens, D] from [B, L, D].

    Inverse of modality_scatter for the v-prediction extraction
    (modeling_showo2_qwen2_5.py:410-419).  num_tokens includes the time
    slot when add_time_embeds; spans shorter than num_tokens gather
    clipped positions (callers mask by length > 0).
    """
    import jax

    B, L, D = x.shape
    M = modality_positions.shape[1]
    off = modality_positions[:, :, 0]                             # [B, M]

    def gather_one(xb, offb):
        idx = offb[:, None] + jnp.arange(num_tokens)[None, :]     # [M, T]
        return xb[jnp.clip(idx, 0, L - 1)]                        # [M, T, D]

    return jax.vmap(gather_one)(x, off).reshape(B * M, num_tokens, D)
