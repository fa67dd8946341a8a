"""Autoregressive decode with a real KV cache, as one compiled scan.

Upgrade over the reference ``mmu_generate`` (models/modeling_showo.py:183-240)
which re-forwards the whole sequence per token with a host-grown mask; the
sampling distribution (temperature / top-k multinomial) is unchanged.

The mask semantics of the grown reference mask reduce to "each new token
attends to every previous position" (the mmu omni mask's extra visibility
is strictly below the causal diagonal for appended rows), so decode steps
use a simple length bias over the cache.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from showo_tpu.ops.masks import NEG_INF


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering, reference-exact semantics.

    Matches models/sampling.py:80-110 (``top_k_top_p_filtering``) and the
    inline v2 copies (show-o2/models/modeling_showo2_qwen2_5.py:617-624,
    :696-703): sort descending, cumulative softmax probabilities, remove
    tokens whose *exclusive* cumulative probability exceeds ``top_p`` —
    the reference shifts the inclusive-cumsum mask right by one so the
    first token crossing the threshold is kept (and position 0 always is).
    """
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = exclusive <= top_p
    inv = jnp.argsort(sorted_idx, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, -jnp.inf)


def _sample_logits(key, logits, temperature: float, top_k: Optional[int],
                   gumbel=None, top_p: Optional[float] = None):
    logits = logits / temperature
    if top_k is not None:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    if gumbel is not None:
        # RNG-bridging harness: argmax(logits + g) == multinomial(softmax)
        return jnp.argmax(logits + gumbel, axis=-1)
    return jax.random.categorical(key, logits, axis=-1)


def ar_generate(
    prefill_fn: Callable,
    decode_fn: Callable,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eot_token: Optional[int] = None,
    prompt_bias: Optional[jnp.ndarray] = None,
    injected_gumbel: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_new_tokens], valid_mask [B, max_new_tokens]).

    prefill_fn(ids, bias) -> (logits [B, S, V], cache)
    decode_fn(ids_step [B,1], bias [B,1,1,K], cache) -> (logits [B,1,V], cache)

    valid_mask marks tokens up to and including the first ``eot_token``.
    """
    B, S = prompt_ids.shape

    logits, cache = prefill_fn(prompt_ids, prompt_bias)
    cap = cache.k.shape[2]

    key, k0 = jax.random.split(key)
    g0 = injected_gumbel[0] if injected_gumbel is not None else None
    next_tok = _sample_logits(k0, logits[:, -1, :], temperature, top_k, g0,
                              top_p)

    def step(carry, step_idx):
        tok, cache, key = carry
        key, k1 = jax.random.split(key)
        # visible = all cached positions written so far
        kpos = jnp.arange(cap)[None, None, None, :]
        bias = jnp.where(kpos < cache.length + 1, 0.0, NEG_INF)
        logits, cache = decode_fn(tok[:, None], bias, cache)
        g = (injected_gumbel[step_idx + 1]
             if injected_gumbel is not None else None)
        nxt = _sample_logits(k1, logits[:, -1, :], temperature, top_k, g,
                             top_p)
        return (nxt, cache, key), tok

    (_, _, _), toks = jax.lax.scan(
        step, (next_tok, cache, key), jnp.arange(max_new_tokens))
    toks = jnp.moveaxis(toks, 0, 1)  # [B, T]

    if eot_token is not None:
        hit = toks == eot_token
        seen = jnp.cumsum(hit, axis=1)
        valid = (seen == 0) | (hit & (seen == 1))
    else:
        valid = jnp.ones_like(toks, dtype=bool)
    return toks, valid
