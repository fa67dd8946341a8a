"""Omni attention masks, computed vectorized on device.

The reference builds its 4D masks with per-sample python loops
(training/prompting_utils.py:466-624); here every builder is pure
jnp span/cumsum arithmetic, so mask construction lives *inside* the
compiled step instead of on the host.  Semantics are bit-for-bit
faithful to the reference builders — including their quirks (e.g. the
mmu mask unmasks every column up to the *first batch element's* first
``eoi``; lvg_v2 forces column 0 visible) — verified by golden tests.

Boolean masks use True = "may attend".  ``to_additive`` converts to the
additive form consumed by attention (0 where visible, large-negative
elsewhere).  The reference fills with ``iinfo(int64).min`` and lets
torch cast; on TPU we use a finite large-negative float so bf16/fp32
softmax stays NaN-free.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-negative fill for masked logits.  float32(-1e9) is far below any
# attainable logit yet keeps softmax finite in bf16 and fp32.
NEG_INF = -1e9


def to_additive(mask_bool: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[..., L, L] bool (True = attend) -> additive bias (0 / NEG_INF)."""
    return jnp.where(mask_bool, jnp.zeros((), dtype), jnp.full((), NEG_INF, dtype))


def _causal(L: int) -> jnp.ndarray:
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    return j <= i


def _image_segments(sequence: jnp.ndarray, soi_id: int, eoi_id: int) -> jnp.ndarray:
    """True where token is inside (inclusive) an soi..eoi span.

    Matches prompting_utils.py:479-481: cumulative soi/eoi counting.
    """
    is_soi = sequence == soi_id
    is_eoi = sequence == eoi_id
    c_soi = jnp.cumsum(is_soi, axis=1)
    c_eoi = jnp.cumsum(is_eoi, axis=1)
    return (c_soi > c_eoi) | is_soi | is_eoi


def _first_index(cond: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Index of first True along axis (len if none)."""
    return jnp.argmax(cond, axis=axis) + jnp.where(
        jnp.any(cond, axis=axis), 0, cond.shape[axis]
    )


def _last_index(cond: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Index of last True along axis (-1 if none)."""
    L = cond.shape[axis]
    rev = jnp.flip(cond, axis=axis)
    idx = L - 1 - jnp.argmax(rev, axis=axis)
    return jnp.where(jnp.any(cond, axis=axis), idx, -1)


def omni_mask_predict_next(
    sequence: jnp.ndarray,
    pad_id: int,
    soi_id: int,
    eoi_id: int,
    rm_pad_in_image: bool = False,
    return_inverse_mask: bool = True,
    dtype=jnp.float32,
):
    """The v1 "omni" mask: causal for text rows, full bidirectional for
    image-span rows (prompting_utils.py:466-511 ``create_attention_mask_predict_next``).

    sequence: [N, L] int token ids.  Returns [N, 1, L, L].
    """
    N, L = sequence.shape
    is_pad = sequence == pad_id
    in_image = _image_segments(sequence, soi_id, eoi_id)
    is_text = ~in_image
    causal = _causal(L)

    # text rows: causal
    mask_text = is_text[:, :, None] & causal[None, :, :]
    # image rows: fully bidirectional (is_text | in_image == everything)
    mask_bi = jnp.ones((N, L, L), dtype=bool)

    if rm_pad_in_image:
        # rows after the last pad do not attend to columns <= last pad
        pad_end = _last_index(is_pad, axis=1)  # [N], -1 if no pad
        has_pad = jnp.any(is_pad, axis=1)
        i = jnp.arange(L)[None, :, None]
        j = jnp.arange(L)[None, None, :]
        after_rows = i > pad_end[:, None, None]
        upto_cols = j <= pad_end[:, None, None]
        mask_text = mask_text & ~(has_pad[:, None, None] & after_rows & upto_cols)
        # from the (first) soi row onward, no attending to pad columns
        sid = _first_index(sequence == soi_id, axis=1)  # [N]
        from_soi = i >= sid[:, None, None]
        mask_bi = mask_bi & ~(from_soi & is_pad[:, None, :])

    mask = jnp.where(in_image[:, :, None], mask_bi, mask_text)
    mask = mask[:, None, :, :]
    if return_inverse_mask:
        return to_additive(mask, dtype)
    return mask


def omni_mask_mmu(
    sequence: jnp.ndarray,
    eoi_id: int,
    return_inverse_mask: bool = True,
    dtype=jnp.float32,
):
    """MMU mask: causal + full visibility of the image prefix
    (prompting_utils.py:591-604 ``create_attention_mask_for_mmu``).

    Reference quirk preserved: the cutoff column is the *first* ``eoi``
    occurrence flattened over the whole batch (``eoi_image[0]``), applied
    to every batch element.
    """
    N, L = sequence.shape
    causal = _causal(L)[None, None, :, :]
    is_eoi = sequence == eoi_id
    # first eoi in flattened batch order == first eoi of the first row that
    # has one; rows are scanned in order, so take row-wise first index and
    # then the first row with any eoi.
    row_first = _first_index(is_eoi, axis=1)  # [N]
    has = jnp.any(is_eoi, axis=1)
    first_row = _first_index(has, axis=0)
    eoi_col = row_first[jnp.clip(first_row, 0, N - 1)]
    j = jnp.arange(L)[None, None, None, :]
    mask = causal | (j <= eoi_col)
    mask = jnp.broadcast_to(mask, (N, 1, L, L))
    if return_inverse_mask:
        return to_additive(mask, dtype)
    return mask


def omni_mask_mmu_vit(
    N: int,
    L: int,
    system_prompt_len: int = 0,
    num_patches: int = 576,
    return_inverse_mask: bool = True,
    dtype=jnp.float32,
):
    """MMU mask for the CLIP-ViT path (prompting_utils.py:606-624): causal
    with the spliced image-feature span fully visible.  Shape-only (the
    reference takes embeddings, uses only N, L)."""
    causal = _causal(L)
    lo = 1 + system_prompt_len + 1
    hi = lo + num_patches
    j = jnp.arange(L)[None, :]
    mask = causal | ((j >= lo) & (j < hi))
    mask = jnp.broadcast_to(mask[None, None], (N, 1, L, L))
    if return_inverse_mask:
        return to_additive(mask, dtype)
    return mask


def omni_mask_lvg(
    sequence: jnp.ndarray,
    pad_id: int,
    soi_id: int,
    eoi_id: int,
    num_images: int,
    return_inverse_mask: bool = True,
    dtype=jnp.float32,
):
    """Multi-image variant (prompting_utils.py:513-538): causal base, each
    soi..eoi span bidirectional within itself, pads invisible from the first
    soi row onward.  ``num_images`` is the static per-row span count."""
    N, L = sequence.shape
    is_pad = sequence == pad_id
    causal = jnp.broadcast_to(_causal(L)[None], (N, L, L))

    soi_pos = _span_positions(sequence == soi_id, num_images)  # [N, num_images]
    eoi_pos = _span_positions(sequence == eoi_id, num_images)

    i = jnp.arange(L)[None, :, None]
    j = jnp.arange(L)[None, None, :]
    # reference order: tril -> zero pad columns from first-soi row -> set
    # each span block fully visible (overriding the pad zeroing in-span)
    first_soi = soi_pos[:, 0][:, None, None]
    mask = causal & ~((i >= first_soi) & is_pad[:, None, :])
    for k in range(num_images):
        s = soi_pos[:, k][:, None, None]
        e = eoi_pos[:, k][:, None, None]
        in_span_i = (i >= s) & (i <= e)
        in_span_j = (j >= s) & (j <= e)
        mask = mask | (in_span_i & in_span_j)

    mask = mask[:, None]
    if return_inverse_mask:
        return to_additive(mask, dtype)
    return mask


def omni_mask_lvg_v2(
    sequence: jnp.ndarray,
    pad_id: int,
    soi_id: int,
    eoi_id: int,
    sot_id: int,
    eot_id: int,
    num_images: int,
    num_texts: int,
    return_inverse_mask: bool = True,
    dtype=jnp.float32,
):
    """lvg_v2 (prompting_utils.py:541-589): text tokens never attend image
    regions; per-span bidirectionality; column 0 forced visible (reference
    line 580 ``mask[:, :, 0] = 1``)."""
    N, L = sequence.shape
    is_pad = sequence == pad_id
    is_text = sequence < pad_id
    causal = jnp.broadcast_to(_causal(L)[None], (N, L, L))

    if sot_id == eot_id:
        # reference pairs up the shared markers: even occurrences open a
        # span, odd occurrences close it (prompting_utils.py:553-560)
        marks = _span_positions(sequence == sot_id, 2 * num_texts)
        sot_pos, eot_pos = marks[:, 0::2], marks[:, 1::2]
    else:
        sot_pos = _span_positions(sequence == sot_id, num_texts)
        eot_pos = _span_positions(sequence == eot_id, num_texts)
    soi_pos = _span_positions(sequence == soi_id, num_images)
    eoi_pos = _span_positions(sequence == eoi_id, num_images)

    i = jnp.arange(L)[None, :, None]
    j = jnp.arange(L)[None, None, :]

    # allowed[b, i, j]: the reference's `all_zeros` visibility matrix
    allowed = jnp.broadcast_to(is_text[:, None, :], (N, L, L))
    for k in range(num_texts):
        s = sot_pos[:, k][:, None, None]
        e = eot_pos[:, k][:, None, None]
        in_tspan_j = (j >= s) & (j <= e)
        allowed = allowed | in_tspan_j  # both text and non-text rows see text spans
    for k in range(num_images):
        s = soi_pos[:, k][:, None, None]
        e = eoi_pos[:, k][:, None, None]
        in_ispan_j = (j >= s) & (j <= e)
        allowed = allowed | (~is_text[:, :, None] & in_ispan_j)

    mask = causal & allowed

    first_soi = soi_pos[:, 0][:, None, None]
    mask = mask & ~((i >= first_soi) & is_pad[:, None, :])
    for k in range(num_images):
        s = soi_pos[:, k][:, None, None]
        e = eoi_pos[:, k][:, None, None]
        in_span_i = (i >= s) & (i <= e)
        in_span_j = (j >= s) & (j <= e)
        mask = mask | (in_span_i & in_span_j)

    mask = mask.at[:, :, 0].set(True)

    mask = mask[:, None]
    if return_inverse_mask:
        return to_additive(mask, dtype)
    return mask


def _span_positions(flags: jnp.ndarray, count: int) -> jnp.ndarray:
    """Positions of the first ``count`` True flags per row, [N, count].

    Rows are expected to contain exactly ``count`` marker tokens (as in the
    reference's reshape to [N, count]).
    """
    N, L = flags.shape
    order = jnp.cumsum(flags, axis=1) - 1  # occurrence index at each True
    idx = jnp.arange(L)[None, :]
    out = jnp.full((N, count), L, dtype=jnp.int32)
    # scatter: for each occurrence k, position = min index with order==k & flag
    for k in range(count):
        sel = flags & (order == k)
        out = out.at[:, k].set(_first_index(sel, axis=1).astype(jnp.int32))
    return out
