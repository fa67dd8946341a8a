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
dynamic_update_slice path as plain per-lane decode.

Two verify rules:
  * greedy (top_k=1): accept the longest prefix where the model's argmax
    agrees with the draft — TOKEN-exact vs plain greedy decode.
  * sampling (temperature / top-k / top-p): rejection resampling
    (Leviathan et al. 2023) specialized to the point-mass draft that
    prompt-lookup produces — accept drafted token x with probability
    p(x) under the filtered target distribution; on rejection sample
    from the residual norm(max(p - q, 0)), which for a point-mass q is
    exactly p with x masked out, renormalized.  The emitted sequence is
    DISTRIBUTION-exact: every token is a sample from the same filtered
    softmax plain AR sampling would use (tests/test_spec_sampling.py
    checks the marginals).  Acceptance rate is p(draft), so the speedup
    only materializes when the model is confident on copied spans —
    greedy stays the recommended serving mode when exact replay of
    plain decode matters.

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
from showo_tpu.serving.decode_chunk import kv_cache_write


def verify_greedy(key, logits, draft):
    """Greedy verify: longest draft prefix the argmax agrees with.

    logits [slots, K+1, V], draft [slots, K] ->
    (out [slots, K+1], m [slots]): out[s, :m[s]+1] are the tokens lane s
    emits this step (accepted draft prefix + the model's own next
    token); token-exact vs plain greedy decode.
    """
    del key
    K = draft.shape[1]
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)            # [slots, K+1]
    acc = jnp.cumprod((nxt[:, :K] == draft).astype(jnp.int32), 1)
    return nxt, jnp.sum(acc, axis=1)


def make_verify_sample(temperature: float, top_k, top_p):
    """Rejection-resampling verify for point-mass (prompt-lookup) drafts.

    Each emitted token is an exact sample from the filtered softmax the
    plain AR path (sampling/ar.py::_sample_logits) would sample from:
    accept draft x_i with probability p_i(x_i); at the first rejection
    sample from p_i with x_i masked out (the normalized residual); if
    every draft survives, sample the bonus token from p_K unmasked.
    """
    from showo_tpu.sampling.ar import top_p_filter

    def verify(key, logits, draft):
        K = draft.shape[1]
        flog = logits / temperature
        if top_k is not None:
            kth = jax.lax.top_k(flog, top_k)[0][..., -1:]
            flog = jnp.where(flog < kth, -jnp.inf, flog)
        if top_p is not None and top_p < 1.0:
            flog = top_p_filter(flog, top_p)
        p = jax.nn.softmax(flog, axis=-1)                     # [slots,K+1,V]
        k_u, k_r, k_b = jax.random.split(key, 3)
        u = jax.random.uniform(k_u, draft.shape)
        p_draft = jnp.take_along_axis(p[:, :K], draft[..., None],
                                      axis=-1)[..., 0]
        acc = jnp.cumprod((u < p_draft).astype(jnp.int32), 1)
        m = jnp.sum(acc, axis=1)                              # 0..K
        # residual at each draft position: p with the drafted token
        # masked out (never selected when the position accepted)
        rlog = flog[:, :K]
        rlog = jnp.where(
            jax.nn.one_hot(draft, rlog.shape[-1], dtype=bool), -jnp.inf,
            rlog)
        resamp = jax.random.categorical(k_r, rlog, axis=-1)   # [slots, K]
        bonus = jax.random.categorical(k_b, flog[:, K], axis=-1)
        ridx = jnp.minimum(m, K - 1)
        chosen = jnp.where(
            m < K,
            jnp.take_along_axis(resamp, ridx[:, None], axis=1)[:, 0],
            bonus).astype(jnp.int32)
        ar = jnp.arange(K + 1)[None, :]
        d1 = jnp.concatenate([draft, jnp.zeros_like(draft[:, :1])], 1)
        out = jnp.where(ar < m[:, None], d1,
                        jnp.where(ar == m[:, None], chosen[:, None], 0))
        return out.astype(jnp.int32), m

    return verify


def _make_draft(cap: int, K: int):
    """Prompt-lookup draft for one lane: longest-match-first — bigram
    (prev, cur), else unigram (cur), else position 0 (acceptance ~0,
    still correct)."""
    idx = jnp.arange(cap)

    def draft_one(b, ln, cur):
        prev = b[jnp.maximum(ln - 1, 0)]
        m2 = (b[:-1] == prev) & (b[1:] == cur) & (idx[:-1] < ln - 1)
        j2 = jnp.max(jnp.where(m2, idx[:-1], -1))
        m1 = (b == cur) & (idx < ln)
        j1 = jnp.max(jnp.where(m1, idx, -1))
        start = jnp.where(j2 >= 0, j2 + 2,
                          jnp.where(j1 >= 0, j1 + 1, 0))
        start = jnp.minimum(start, cap - K)
        return jax.lax.dynamic_slice(b, (start,), (K,))

    return draft_one


def _make_spec_decode_chunk_local(window_fwd, fresh_shape, *, cap: int,
                                  chunk: int, K: int, dtype,
                                  verify=verify_greedy):
    """Chunk-local (fresh-KV) draft -> verify -> accept chunk program.

    Same contract as _make_spec_decode_chunk, but the big cache is
    loop-invariant across the chunk's steps (see decode_chunk.py): each
    step's K+1 window rows land in a side buffer at the lane's
    chunk-relative offset lens - lens0 (data-dependent — lanes advance
    by their accepted count m+1), rejected rows are overwritten by the
    next step's window (m+1 <= K+1 keeps writes contiguous), and the
    buffer scatters into the donated cache once per chunk.  Token
    streams are identical to the naive program (same logit sets, fp32
    summation order aside).

    window_fwd(p, window [slots, K+1], lens0, lens, ck, cv, fk, fv)
        -> (logits [slots, K+1, V], fk, fv)   (decode_chunk.py makers)
    Fcap (fresh_shape[2]) must be >= chunk * (K + 1).
    """
    from showo_tpu.serving.decode_chunk import scatter_fresh

    draft_one = _make_draft(cap, K)

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def decode_chunk_spec(params, cache_k, cache_v, buf, lengths, tok, key):
        p = params["showo"]
        lens0 = lengths
        fk0 = jnp.zeros(fresh_shape, dtype)
        fv0 = jnp.zeros(fresh_shape, dtype)

        def step(carry, _):
            fk, fv, buf, lens, tok, key = carry
            key, kv = jax.random.split(key)
            draft = jax.vmap(draft_one)(buf, lens, tok)       # [slots, K]
            window = jnp.concatenate([tok[:, None], draft], 1)
            logits, fk, fv = window_fwd(p, window, lens0, lens,
                                        cache_k, cache_v, fk, fv)
            out, m = verify(kv, logits, draft)
            buf = jax.vmap(lambda b, row, ln: jax.lax.dynamic_update_slice(
                b, row, (ln + 1,)))(buf, out, lens)
            cur = jnp.take_along_axis(out, m[:, None], axis=1)[:, 0]
            return (fk, fv, buf, lens + m + 1, cur, key), (out, m + 1)

        (fk, fv, buf, lens, cur, key), (toks, nvalid) = jax.lax.scan(
            step, (fk0, fv0, buf, lengths, tok, key), None, length=chunk)
        cache_k, cache_v = scatter_fresh(cache_k, cache_v, fk, fv, lens0)
        return cache_k, cache_v, buf, lens, cur, key, toks, nvalid

    return decode_chunk_spec


def _make_spec_decode_chunk(forward_step, *, cap: int, chunk: int, K: int,
                            dtype, verify=verify_greedy):
    """Shared draft -> verify -> accept chunk program.

    forward_step(params, window [slots, K+1] ids, bias, ck, cv, lens)
        -> (logits [slots, K+1, V], new_ck, new_cv)
    verify(key, logits [slots, K+1, V], draft [slots, K])
        -> (out [slots, K+1], m [slots]); lane s emits out[s, :m[s]+1].
    """

    draft_one = _make_draft(cap, K)

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def decode_chunk_spec(params, cache_k, cache_v, buf, lengths, tok, key):
        kpos = jnp.arange(cap)[None, None, None, :]
        rows = jnp.arange(K + 1)[None, None, :, None]

        def step(carry, _):
            ck, cv, buf, lens, tok, key = carry
            key, kv = jax.random.split(key)
            draft = jax.vmap(draft_one)(buf, lens, tok)       # [slots, K]
            window = jnp.concatenate([tok[:, None], draft], 1)
            bias = jnp.where(
                kpos < (lens[:, None, None, None] + rows + 1), 0.0, NEG_INF
            ).astype(dtype)
            logits, ck, cv = forward_step(params, window, bias, ck, cv,
                                          lens)
            # accept the longest surviving draft prefix, then one token of
            # the model's own (bonus on full acceptance, residual sample
            # on rejection); greedy verify reproduces plain greedy decode
            out, m = verify(kv, logits, draft)
            buf = jax.vmap(lambda b, row, ln: jax.lax.dynamic_update_slice(
                b, row, (ln + 1,)))(buf, out, lens)
            cur = jnp.take_along_axis(out, m[:, None], axis=1)[:, 0]
            return (ck, cv, buf, lens + m + 1, cur, key), (out, m + 1)

        (ck, cv, buf, lens, cur, key), (toks, nvalid) = jax.lax.scan(
            step, (cache_k, cache_v, buf, lengths, tok, key),
            None, length=chunk)
        return ck, cv, buf, lens, cur, key, toks, nvalid

    return decode_chunk_spec


def _pick_verify(temperature, top_k, top_p):
    greedy = top_k == 1 and (top_p is None or top_p >= 1.0)
    return verify_greedy if greedy else make_verify_sample(
        temperature, top_k, top_p)


def build_v1_speculative(server, cfg, *, dtype, eoi, cap: int, chunk: int,
                         draft_k: int, temperature: float = 1.0,
                         top_k=1, top_p=None, chunk_local: bool = True):
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
    from showo_tpu.sampling.ar import _sample_logits

    K = draft_k
    verify = _pick_verify(temperature, top_k, top_p)

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
            cache_k = kv_cache_write(cache_k, tc.k, (0, slot, 0, 0))
            cache_v = kv_cache_write(cache_v, tc.v, (0, slot, 0, 0))
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            tok0 = _sample_logits(key, last[None], temperature, top_k,
                                  None, top_p)[0].astype(jnp.int32)
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

    if chunk_local:
        # fresh-KV restructuring (decode_chunk.py): the big cache is
        # loop-invariant across the chunk instead of rematerialized per
        # step (60% of the naive step at slots=8/cap=512)
        from showo_tpu.serving.decode_chunk import make_v1_window_forward

        fwd, fresh_shape = make_v1_window_forward(
            cfg, slots=server.buf.shape[0], cap=cap,
            Fcap=chunk * (K + 1), dtype=dtype)
        decode_chunk_spec = _make_spec_decode_chunk_local(
            fwd, fresh_shape, cap=cap, chunk=chunk, K=K, dtype=dtype,
            verify=verify)
    else:
        def forward_step(params, window, bias, ck, cv, lens):
            logits, cache = showo_forward(cfg, params, input_ids=window,
                                          attention_bias=bias,
                                          cache=KVCache(ck, cv, lens))
            return logits, cache.k, cache.v

        decode_chunk_spec = _make_spec_decode_chunk(
            forward_step, cap=cap, chunk=chunk, K=K, dtype=dtype,
            verify=verify)

    def decode_wrapper(ck, cv, lens, tok, key):
        (ck, cv, server.buf, lens, cur, key, toks,
         nvalid) = decode_chunk_spec(server.params, ck, cv, server.buf,
                                     lens, tok, key)
        return ck, cv, lens, cur, key, toks, nvalid

    return make_prefill, decode_wrapper


def build_v2_speculative(server, cfg, *, dtype, n_img, cap: int, chunk: int,
                         draft_k: int, temperature: float = 1.0,
                         top_k=1, top_p=None, chunk_local: bool = True):
    """Returns (make_prefill, decode_wrapper) for Showo2MMUServer.

    Prompts are embeddings; the token ring holds -1 where no id is known
    (image span, any text the caller didn't provide) plus the per-request
    ``lookup_row`` meta (question ids at their true sequence positions)
    and all generated ids.  -1 never equals a sampled token, so the
    n-gram search only ever drafts from known-id positions.
    """
    from showo_tpu.sampling.ar import _sample_logits
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward

    K = draft_k
    llm = cfg.llm
    verify = _pick_verify(temperature, top_k, top_p)

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
            cache_k = kv_cache_write(cache_k, tc.k, (0, slot, 0, 0))
            cache_v = kv_cache_write(cache_v, tc.v, (0, slot, 0, 0))
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            tok0 = _sample_logits(key, last[None], temperature, top_k,
                                  None, top_p)[0].astype(jnp.int32)
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

    if chunk_local:
        from showo_tpu.serving.decode_chunk import make_v2_window_forward

        fwd, fresh_shape = make_v2_window_forward(
            llm, slots=server.buf.shape[0], cap=cap,
            Fcap=chunk * (K + 1), dtype=dtype)
        decode_chunk_spec = _make_spec_decode_chunk_local(
            fwd, fresh_shape, cap=cap, chunk=chunk, K=K, dtype=dtype,
            verify=verify)
    else:
        def forward_step(params, window, bias, ck, cv, lens):
            emb = params["showo"]["embed"][window]
            logits, _, cache = qwen2_forward(
                llm, params["showo"], input_embeds=emb, attention_bias=bias,
                cache=Qwen2KVCache(ck, cv, lens),
                position_ids=lens[:, None] + jnp.arange(window.shape[1]),
                cache_offsets=lens)
            return logits, cache.k, cache.v

        decode_chunk_spec = _make_spec_decode_chunk(
            forward_step, cap=cap, chunk=chunk, K=K, dtype=dtype,
            verify=verify)

    def decode_wrapper(ck, cv, lens, tok, key):
        (ck, cv, server.buf, lens, cur, key, toks,
         nvalid) = decode_chunk_spec(server.params, ck, cv, server.buf,
                                     lens, tok, key)
        return ck, cv, lens, cur, key, toks, nvalid

    return make_prefill, decode_wrapper
