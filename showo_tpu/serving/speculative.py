"""Speculative decoding for the serving engine: prompt-lookup drafting.

Beyond-parity serving feature (the reference has no speculative path).
AR decode on TPU is weight-bandwidth-bound — every step streams all
layer weights for ONE row per lane — so verifying k drafted tokens in a
single (k+1)-row forward reuses the same weight reads almost for free.
Drafts come from the lane's own context (prompt-lookup / n-gram
matching, the assisted-generation trick): MMU answers frequently copy
spans of the question or repeat earlier phrasing, and a greedy verify
pass accepts exactly the tokens standard greedy decoding would emit —
the output is TOKEN-EXACT vs plain greedy decode, only faster when
drafts hit.

TPU-shaped: a fixed draft length K keeps every shape static; the n-gram
search is a vectorized max-over-masked-index on a device-resident
[slots, cap] token ring; acceptance is a cumprod over the verify
window; per-lane cache/buffer writes ride the same vmapped
dynamic_update_slice path as plain per-lane decode.  Greedy only
(top_k=1): exactness under sampling would need rejection resampling.

v1 (ShowoMMUServer): the ring holds the full prompt + generated ids.
v2 (Showo2MMUServer): prompts are embeddings, so the ring holds -1 at
embedding-only positions (image span etc.), the caller's optional
``lookup_ids`` (the question's token ids at their true positions), and
every generated id — -1 never matches a real token, so drafts come
only from positions whose ids are known.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from showo_tpu.ops.masks import NEG_INF


def _make_spec_decode_chunk(forward_step, *, cap: int, chunk: int, K: int,
                            dtype):
    """Shared draft -> verify -> accept chunk program.

    forward_step(params, window [slots, K+1] ids, bias, ck, cv, lens)
        -> (logits [slots, K+1, V], new_ck, new_cv)
    """

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def decode_chunk_spec(params, cache_k, cache_v, buf, lengths, tok, key):
        kpos = jnp.arange(cap)[None, None, None, :]
        idx = jnp.arange(cap)
        rows = jnp.arange(K + 1)[None, None, :, None]

        def draft_one(b, ln, cur):
            # longest-match-first: bigram (prev, cur), else unigram (cur),
            # else position 0 (acceptance ~0, still correct)
            prev = b[jnp.maximum(ln - 1, 0)]
            m2 = (b[:-1] == prev) & (b[1:] == cur) & (idx[:-1] < ln - 1)
            j2 = jnp.max(jnp.where(m2, idx[:-1], -1))
            m1 = (b == cur) & (idx < ln)
            j1 = jnp.max(jnp.where(m1, idx, -1))
            start = jnp.where(j2 >= 0, j2 + 2,
                              jnp.where(j1 >= 0, j1 + 1, 0))
            start = jnp.minimum(start, cap - K)
            return jax.lax.dynamic_slice(b, (start,), (K,))

        def step(carry, _):
            ck, cv, buf, lens, tok, key = carry
            draft = jax.vmap(draft_one)(buf, lens, tok)       # [slots, K]
            window = jnp.concatenate([tok[:, None], draft], 1)
            bias = jnp.where(
                kpos < (lens[:, None, None, None] + rows + 1), 0.0, NEG_INF
            ).astype(dtype)
            logits, ck, cv = forward_step(params, window, bias, ck, cv,
                                          lens)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)    # [slots, K+1]
            # accept the longest prefix where the model agrees with the
            # draft, then the model's own next token ("bonus") — exactly
            # greedy decoding's output
            acc = jnp.cumprod((nxt[:, :K] == draft).astype(jnp.int32), 1)
            m = jnp.sum(acc, axis=1)                          # 0..K
            buf = jax.vmap(lambda b, row, ln: jax.lax.dynamic_update_slice(
                b, row, (ln + 1,)))(buf, nxt, lens)
            cur = jnp.take_along_axis(nxt, m[:, None], axis=1)[:, 0]
            return (ck, cv, buf, lens + m + 1, cur, key), (nxt, m + 1)

        (ck, cv, buf, lens, cur, key), (toks, nvalid) = jax.lax.scan(
            step, (cache_k, cache_v, buf, lengths, tok, key),
            None, length=chunk)
        return ck, cv, buf, lens, cur, key, toks, nvalid

    return decode_chunk_spec


def build_v1_speculative(server, cfg, *, dtype, eoi, cap: int, chunk: int,
                         draft_k: int):
    """Returns (make_prefill, decode_wrapper) for ShowoMMUServer.

    server.buf is the device token ring [slots, cap]: positions
    0..len hold prompt + accepted tokens with buf[len] == the token to
    feed next (the engine's cur_tok); garbage may live past len and is
    never read (all lookups mask idx <= len) and is overwritten as the
    lane advances.
    """
    from showo_tpu.models.phi import KVCache
    from showo_tpu.models.showo import showo_forward
    from showo_tpu.ops.masks import omni_mask_mmu

    K = draft_k

    def make_prefill(bucket: int):
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, cache_k, cache_v, buf, padded, true_len, slot,
                    key):
            tmp = KVCache.zeros(cfg.llm, 1, bucket, dtype=dtype)
            bias = omni_mask_mmu(padded, eoi_id=eoi, dtype=dtype)
            cols = jnp.arange(bucket)[None, None, None, :]
            bias = jnp.where(cols < true_len, bias, NEG_INF)
            logits, tc = showo_forward(cfg, params, input_ids=padded,
                                       attention_bias=bias, cache=tmp)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, tc.k.astype(cache_k.dtype), (0, slot, 0, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, tc.v.astype(cache_v.dtype), (0, slot, 0, 0, 0))
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            tok0 = jnp.argmax(last).astype(jnp.int32)
            buf = jax.lax.dynamic_update_slice(
                buf, padded.astype(jnp.int32), (slot, 0))
            buf = jax.lax.dynamic_update_slice(
                buf, tok0[None, None], (slot, true_len))
            return cache_k, cache_v, buf, tok0

        def wrap(ck, cv, padded, true_len, slot, key):
            ck, cv, server.buf, tok0 = prefill(
                server.params, ck, cv, server.buf, padded, true_len, slot,
                key)
            return ck, cv, tok0

        return wrap

    def forward_step(params, window, bias, ck, cv, lens):
        logits, cache = showo_forward(cfg, params, input_ids=window,
                                      attention_bias=bias,
                                      cache=KVCache(ck, cv, lens))
        return logits, cache.k, cache.v

    decode_chunk_spec = _make_spec_decode_chunk(
        forward_step, cap=cap, chunk=chunk, K=K, dtype=dtype)

    def decode_wrapper(ck, cv, lens, tok, key):
        (ck, cv, server.buf, lens, cur, key, toks,
         nvalid) = decode_chunk_spec(server.params, ck, cv, server.buf,
                                     lens, tok, key)
        return ck, cv, lens, cur, key, toks, nvalid

    return make_prefill, decode_wrapper


def build_v2_speculative(server, cfg, *, dtype, n_img, cap: int, chunk: int,
                         draft_k: int):
    """Returns (make_prefill, decode_wrapper) for Showo2MMUServer.

    Prompts are embeddings; the token ring holds -1 where no id is known
    (image span, any text the caller didn't provide) plus the per-request
    ``lookup_row`` meta (question ids at their true sequence positions)
    and all generated ids.  -1 never equals a sampled token, so the
    n-gram search only ever drafts from known-id positions.
    """
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward

    K = draft_k
    llm = cfg.llm

    def make_prefill(bucket: int):
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, cache_k, cache_v, buf, padded_emb, true_len,
                    slot, key, img_start, lookup_row):
            tmp = Qwen2KVCache.zeros(llm, 1, bucket, dtype=dtype)
            mp = jnp.stack([img_start,
                            jnp.full_like(img_start, n_img)])[None, None]
            bias = omni_attn_mask(mp, bucket, dtype=dtype)
            cols = jnp.arange(bucket)[None, None, None, :]
            bias = jnp.where(cols < true_len, bias, NEG_INF)
            logits, _, tc = qwen2_forward(
                llm, params["showo"], input_embeds=padded_emb,
                attention_bias=bias, cache=tmp)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, tc.k.astype(cache_k.dtype), (0, slot, 0, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, tc.v.astype(cache_v.dtype), (0, slot, 0, 0, 0))
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            tok0 = jnp.argmax(last).astype(jnp.int32)
            buf = jax.lax.dynamic_update_slice(
                buf, lookup_row[None], (slot, 0))
            buf = jax.lax.dynamic_update_slice(
                buf, tok0[None, None], (slot, true_len))
            return cache_k, cache_v, buf, tok0

        def wrap(ck, cv, padded, true_len, slot, key, img_start,
                 lookup_row):
            ck, cv, server.buf, tok0 = prefill(
                server.params, ck, cv, server.buf, padded, true_len, slot,
                key, img_start, lookup_row)
            return ck, cv, tok0

        return wrap

    def forward_step(params, window, bias, ck, cv, lens):
        emb = params["showo"]["embed"][window]
        logits, _, cache = qwen2_forward(
            llm, params["showo"], input_embeds=emb, attention_bias=bias,
            cache=Qwen2KVCache(ck, cv, lens),
            position_ids=lens[:, None] + jnp.arange(window.shape[1]),
            cache_offsets=lens)
        return logits, cache.k, cache.v

    decode_chunk_spec = _make_spec_decode_chunk(
        forward_step, cap=cap, chunk=chunk, K=K, dtype=dtype)

    def decode_wrapper(ck, cv, lens, tok, key):
        (ck, cv, server.buf, lens, cur, key, toks,
         nvalid) = decode_chunk_spec(server.params, ck, cv, server.buf,
                                     lens, tok, key)
        return ck, cv, lens, cur, key, toks, nvalid

    return make_prefill, decode_wrapper
