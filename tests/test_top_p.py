"""Nucleus (top-p) filtering parity vs the reference algorithm.

Reference semantics replicated here in torch, verbatim from
models/sampling.py:80-110 (``top_k_top_p_filtering``) — the identical
sorted-cumsum + shift-right-by-one logic also appears inline in
show-o2/models/modeling_showo2_qwen2_5.py:617-624 and :696-703.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from showo_tpu.sampling.ar import _sample_logits, top_p_filter


def _reference_top_k_top_p(logits: torch.Tensor, top_k: int = 0,
                           top_p: float = 1.0,
                           filter_value: float = -float("inf")):
    # models/sampling.py:80-110 semantics
    if top_k > 0:
        indices_to_remove = (
            logits < torch.topk(logits, top_k)[0][..., -1, None])
        logits[indices_to_remove] = filter_value
    if top_p < 1.0:
        sorted_logits, sorted_indices = torch.sort(logits, descending=True)
        cumulative_probs = torch.cumsum(
            F.softmax(sorted_logits, dim=-1), dim=-1)
        sorted_indices_to_remove = cumulative_probs > top_p
        sorted_indices_to_remove[..., 1:] = \
            sorted_indices_to_remove[..., :-1].clone()
        sorted_indices_to_remove[..., 0] = 0
        indices_to_remove = sorted_indices_to_remove.scatter(
            1, sorted_indices, sorted_indices_to_remove)
        logits[indices_to_remove] = filter_value
    return logits


@pytest.mark.parametrize("top_p", [0.05, 0.3, 0.9, 0.999])
def test_top_p_mask_matches_reference(top_p):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 97)).astype(np.float32) * 3.0

    ref = _reference_top_k_top_p(torch.tensor(logits.copy()), top_p=top_p)
    ref_kept = torch.isfinite(ref).numpy()

    ours = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
    ours_kept = np.isfinite(ours)

    np.testing.assert_array_equal(ours_kept, ref_kept)
    # surviving logits are untouched
    np.testing.assert_allclose(ours[ours_kept], logits[ref_kept])


def test_top_p_keeps_first_above_threshold():
    # one dominant token with prob > top_p: the shift-right quirk keeps it
    logits = jnp.asarray([[10.0, 0.0, -1.0, -2.0]])
    out = np.asarray(top_p_filter(logits, 0.5))
    assert np.isfinite(out[0, 0])
    assert not np.isfinite(out[0, 1:]).any()


def test_top_k_then_top_p_composition():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 50)).astype(np.float32) * 2.0
    ref = _reference_top_k_top_p(torch.tensor(logits.copy()),
                                 top_k=10, top_p=0.8)
    ref_kept = torch.isfinite(ref).numpy()

    # our composition lives in _sample_logits; extract via injected gumbel
    # of zeros -> argmax over the filtered logits
    filtered = _sample_logits(jax.random.PRNGKey(0), jnp.asarray(logits),
                              temperature=1.0, top_k=10,
                              gumbel=jnp.zeros_like(logits), top_p=0.8)
    # token-exact: argmax of the reference-filtered logits
    ref_tok = torch.argmax(torch.nan_to_num(ref, neginf=-1e30),
                           dim=-1).numpy()
    np.testing.assert_array_equal(np.asarray(filtered), ref_tok)
    assert ref_kept.sum() > 0


def test_token_exact_with_injected_noise():
    """fp32 token-exactness: reference multinomial == argmax(log p + gumbel)
    with the SAME gumbel noise injected on both sides."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(3, 64)).astype(np.float32) * 2.5
    gumbel = rng.gumbel(size=(3, 64)).astype(np.float32)
    top_p, temperature = 0.7, 0.9

    ref = _reference_top_k_top_p(
        torch.tensor(logits.copy() / temperature), top_p=top_p)
    # multinomial(softmax(ref)) with gumbel g == argmax(ref + g) over kept
    ref_tok = torch.argmax(
        torch.nan_to_num(ref, neginf=-1e30) + torch.tensor(gumbel),
        dim=-1).numpy()

    ours = _sample_logits(jax.random.PRNGKey(0), jnp.asarray(logits),
                          temperature=temperature, top_k=None,
                          gumbel=jnp.asarray(gumbel), top_p=top_p)
    np.testing.assert_array_equal(np.asarray(ours), ref_tok)
