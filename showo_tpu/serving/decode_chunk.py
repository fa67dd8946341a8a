"""Chunk-local fresh-KV decode: stop materializing the cache every step.

The naive serving decode step threads the full KV cache through the
layer scan as xs->ys, and XLA materializes a complete new cache buffer
per step (~805 MB at slots=8/cap=512 for the 1.3B tower).  Measured on
chip (tools/probe_decode_cache_copy.py): 16.0 ms/step production vs
6.5 ms/step with a read-only cache — the copy is 60% of the step.

This module restructures the chunk program so the big cache is
LOOP-INVARIANT across the chunk's steps (read-only, closed over by the
step scan — XLA hoists it, no per-step ys):

  * each step writes its fresh K/V row into a tiny side buffer
    [L, slots, chunk, H, Dh] (~13 MB) carried through the step scan;
  * attention is computed in two score pieces — q against the big cache
    (masked at the chunk-start lengths) and q against the fresh rows
    0..i — concatenated BEFORE one softmax, so the probability mass is
    over exactly the same logit set as the naive step (the only
    difference is fp32 summation order, 1-ulp class);
  * at chunk end the side buffer scatters into the donated cache ONCE
    (per-lane dynamic_update_slice at the chunk-start lengths — XLA
    updates the donated buffer in place).

Semantics are identical to the naive chunk: step i's query sits at
position lengths+i, sees cache cols < lengths plus fresh rows j <= i,
and the final cache holds the chunk's rows at lengths..lengths+chunk-1
with lengths advanced by chunk for every lane (idle lanes, pinned to
length 0 by the engine, write garbage rows that a future admission's
prefill overwrites and whose bias never exposes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import (_rope_tables, _wk, apply_rope, layer_norm)
from showo_tpu.ops.masks import NEG_INF
from showo_tpu.sampling.ar import _sample_logits


def _project_in(llm, lp, x):
    """qkv + MLP-input projection across the three param layouts
    (plain / fuse_qkv / fuse_parallel_mlp), models/phi.py::_layer."""
    D = llm.hidden_size
    if "win" in lp:
        y = x @ _wk(lp["win"]) + lp["win"]["bias"]
        return y[..., :3 * D], y[..., 3 * D:]
    if "qkv" in lp:
        qkv = x @ _wk(lp["qkv"]) + lp["qkv"]["bias"]
    else:
        qkv = jnp.concatenate(
            [x @ _wk(lp["q"]) + lp["q"]["bias"],
             x @ _wk(lp["k"]) + lp["k"]["bias"],
             x @ _wk(lp["v"]) + lp["v"]["bias"]], axis=-1)
    return qkv, jax.nn.gelu(x @ _wk(lp["fc1"]) + lp["fc1"]["bias"],
                            approximate=True) @ _wk(lp["fc2"]) \
        + lp["fc2"]["bias"]


def build_v1_decode_chunk(server, cfg, *, dtype, cap: int, chunk: int,
                          temperature: float, top_k: Optional[int],
                          top_p: Optional[float], slots: int):
    """Returns the engine decode_chunk callable (same contract as the
    naive one in ShowoMMUServer): (cache_k, cache_v, lengths, tok, key)
    -> (cache_k, cache_v, lengths', cur, key, toks [chunk, slots, 1],
    nvalid [chunk, slots]).

    Implemented as the W=1 special case of make_v1_window_forward
    (step i's window offset is i for every lane), mirroring
    build_v2_decode_chunk — one layer body to keep in sync with
    models/phi.py."""
    fwd, fresh_shape = make_v1_window_forward(
        cfg, slots=slots, cap=cap, Fcap=chunk, dtype=dtype)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def decode_chunk(params, cache_k, cache_v, lengths, tok, key):
        p = params["showo"]
        fk0 = jnp.zeros(fresh_shape, dtype)
        fv0 = jnp.zeros(fresh_shape, dtype)

        def step(carry, i):
            fk, fv, tok, key = carry
            key, k1 = jax.random.split(key)
            logits, fk, fv = fwd(p, tok[:, None], lengths, lengths + i,
                                 cache_k, cache_v, fk, fv)
            nxt = _sample_logits(k1, logits[:, -1], temperature, top_k,
                                 None, top_p).astype(jnp.int32)
            return (fk, fv, nxt, key), nxt

        (fk, fv, cur, key), toks = jax.lax.scan(
            step, (fk0, fv0, tok, key), jnp.arange(chunk))
        cache_k, cache_v = scatter_fresh(cache_k, cache_v, fk, fv, lengths)
        return (cache_k, cache_v, lengths + chunk, cur, key,
                toks[..., None], jnp.ones_like(toks))

    return lambda *a: decode_chunk(server.params, *a)


# ---------------------------------------------------------------------------
# Windowed chunk-local forward: the same fresh-KV restructuring for a
# W-row query window (W = 1 + draft_k on the speculative path, W = 1 for
# plain v2 decode).  The big cache stays loop-invariant across the
# chunk's steps; each step's W fresh K/V rows land in a side buffer at
# the lane's chunk-relative offset (lens - lens0, data-dependent on the
# speculative path where lanes advance by the accepted count), and the
# buffer scatters into the donated cache ONCE per chunk.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# int8 KV cache: cache_k/cache_v become (data int8 [L,slots,cap,h,Dh],
# scales f32 [L,slots,cap,h]) pairs — per-row-per-head absmax.  The
# engine threads the caches opaquely, so only the builders here (and the
# prefill writers in engine.py) see the pair.  Dequantization never
# materializes: the K scale is applied to the SCORES after the q x k_int8
# dot (one [slots,h,1,cap] multiply), the V scale folds into the PROBS
# before the pr x v_int8 dot — the cache streams from HBM at half the
# bf16 traffic, which is the point (cache reads ~6% of the v1 step).
# ---------------------------------------------------------------------------


def kv_quantize(x):
    """[..., h, Dh] bf16 -> (int8 rounded, f32 absmax/127 scales [..., h])."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-8)[..., None])
    return q.astype(jnp.int8), scale


def kv_cache_zeros(shape, int8: bool, dtype):
    if int8:
        return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32))
    return jnp.zeros(shape, dtype)


def kv_cache_write(cache, rows, index4):
    """dynamic_update_slice rows [L,1,S,h,Dh] at index4 (4d leading idx),
    transparent over the (data, scales) int8 pair."""
    if isinstance(cache, tuple):
        qr, sr = kv_quantize(rows)
        return (jax.lax.dynamic_update_slice(cache[0], qr, index4 + (0,)),
                jax.lax.dynamic_update_slice(cache[1], sr, index4))
    return jax.lax.dynamic_update_slice(cache, rows.astype(cache.dtype),
                                        index4 + (0,))


def scatter_fresh(cache_k, cache_v, fk, fv, lens0):
    """Scatter side buffers [L, slots, Fcap, h, Dh] into the caches at
    each lane's chunk-start length.  Rows past a lane's final length are
    garbage; they are never exposed (bias masks cols >= length) and the
    next chunk's scatter (or an admission prefill) overwrites them.

    INVARIANT: lens0 + Fcap <= cap for every lane, guaranteed by the
    engine's submit-time margin check (ContinuousBatchingEngine._fill_slots
    admits a request only when its budget + chunk margin fits cap).  If it
    were violated, dynamic_update_slice's index clamping would shift the
    whole Fcap-row block backwards and silently overwrite valid earlier
    cache rows — there is no in-graph guard here.

    int8 caches ((data, scales) pairs): the bf16 side buffers are
    quantized here, once per chunk."""
    upd_l = jax.vmap(
        lambda c, f, o: jax.lax.dynamic_update_slice(c, f, (o, 0, 0)),
        in_axes=(0, 0, None))                        # over layers
    upd = jax.vmap(upd_l, in_axes=(1, 1, 0), out_axes=1)   # over lanes
    upd_s = jax.vmap(jax.vmap(
        lambda c, f, o: jax.lax.dynamic_update_slice(c, f, (o, 0)),
        in_axes=(0, 0, None)), in_axes=(1, 1, 0), out_axes=1)

    def one(cache, fresh):
        if isinstance(cache, tuple):
            q, s = kv_quantize(fresh)
            return (upd(cache[0], q, lens0), upd_s(cache[1], s, lens0))
        return upd(cache, fresh.astype(cache.dtype), lens0)

    return one(cache_k, fk), one(cache_v, fv)


def make_v1_window_forward(cfg, *, slots: int, cap: int, Fcap: int, dtype):
    """Chunk-local forward over a token window for the v1 (Phi) tower.

    Returns (fwd, fresh_shape):
      fwd(p_showo, window [slots, W] int32, lens0 [slots], lens [slots],
          cache_k, cache_v, fk, fv) -> (logits [slots, W, V], fk, fv)
    Row r of the window sits at position lens + r; it sees big-cache
    cols < lens0 plus fresh rows j <= (lens - lens0) + r.  Requires
    every lane's lens - lens0 + W <= Fcap (engine chunk accounting).
    """
    llm = cfg.llm
    H, Dh, D = llm.num_heads, llm.head_dim, llm.hidden_size
    fresh_shape = (llm.num_layers, slots, Fcap, H, Dh)

    def fwd(p, window, lens0, lens, cache_k, cache_v, fk, fv):
        W = window.shape[1]
        off = lens - lens0
        h = p["embed"][window]                        # [slots, W, D]
        pos = lens[:, None] + jnp.arange(W)[None, :]
        cos, sin = _rope_tables(pos, llm.rotary_dim, llm.rope_theta)
        kpos = jnp.arange(cap)[None, None, None, :]
        big_bias = jnp.where(kpos < lens0[:, None, None, None], 0.0,
                             NEG_INF).astype(dtype)
        jpos = jnp.arange(Fcap)[None, None, None, :]
        rrows = jnp.arange(W)[None, None, :, None]
        fresh_bias = jnp.where(
            jpos < off[:, None, None, None] + rrows + 1, 0.0,
            NEG_INF).astype(dtype)
        wr = jax.vmap(
            lambda f, x, o: jax.lax.dynamic_update_slice(f, x, (o, 0, 0)))

        def layer(h, xs):
            lp, (ckl, cvl), (fkl, fvl) = xs
            x = layer_norm(h, lp["ln"]["scale"], lp["ln"]["bias"],
                           llm.layer_norm_eps)
            qkv, mlp = _project_in(llm, lp, x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(slots, W, H, Dh)
            k = k.reshape(slots, W, H, Dh)
            v = v.reshape(slots, W, H, Dh)
            q = layer_norm(q, lp["q_ln"]["scale"], lp["q_ln"]["bias"],
                           llm.layer_norm_eps)
            k = layer_norm(k, lp["k_ln"]["scale"], lp["k_ln"]["bias"],
                           llm.layer_norm_eps)
            q, k = apply_rope(q, k, cos, sin, llm.rotary_dim)
            fkl = wr(fkl, k.astype(fkl.dtype), off)
            fvl = wr(fvl, v.astype(fvl.dtype), off)
            scale = 1.0 / (Dh ** 0.5)
            sdt = jnp.float32 if llm.attn_fp32 else jnp.bfloat16
            if isinstance(ckl, tuple):
                # int8 cache: k-scales applied to the SCORES post-dot
                # (one [slots,H,1,cap] multiply), v-scales folded into
                # the PROBS pre-dot — no dequantized cache in HBM
                (ckq, cks), (cvq, cvs) = ckl, cvl
                s1 = jnp.einsum("bqhd,bkhd->bhqk", q,
                                ckq.astype(q.dtype),
                                preferred_element_type=sdt) * scale
                s1 = s1 * cks.transpose(0, 2, 1)[:, :, None, :].astype(sdt)
                s2 = jnp.einsum("bqhd,bkhd->bhqk", q, fkl,
                                preferred_element_type=sdt) * scale
                s = jnp.concatenate(
                    [s1 + big_bias.astype(sdt),
                     s2 + fresh_bias.astype(sdt)], axis=-1)
                pr = jax.nn.softmax(s.astype(sdt), axis=-1)
                pr_big = (pr[..., :cap]
                          * cvs.transpose(0, 2, 1)[:, :, None, :].astype(
                              pr.dtype)).astype(h.dtype)
                attn = (jnp.einsum("bhqk,bkhd->bqhd", pr_big,
                                   cvq.astype(h.dtype),
                                   preferred_element_type=jnp.float32)
                        + jnp.einsum("bhqk,bkhd->bqhd",
                                     pr[..., cap:].astype(fvl.dtype), fvl,
                                     preferred_element_type=jnp.float32)
                        ).astype(h.dtype).reshape(slots, W, D)
            else:
                s1 = jnp.einsum("bqhd,bkhd->bhqk", q, ckl,
                                preferred_element_type=sdt) * scale
                s2 = jnp.einsum("bqhd,bkhd->bhqk", q, fkl,
                                preferred_element_type=sdt) * scale
                s = jnp.concatenate(
                    [s1 + big_bias.astype(sdt),
                     s2 + fresh_bias.astype(sdt)], axis=-1)
                pr = jax.nn.softmax(s.astype(sdt), axis=-1).astype(cvl.dtype)
                attn = (jnp.einsum("bhqk,bkhd->bqhd", pr[..., :cap], cvl,
                                   preferred_element_type=jnp.float32)
                        + jnp.einsum("bhqk,bkhd->bqhd", pr[..., cap:], fvl,
                                     preferred_element_type=jnp.float32)
                        ).astype(h.dtype).reshape(slots, W, D)
            if "wout" in lp:
                z = jnp.concatenate([attn, jax.nn.gelu(
                    mlp, approximate=True)], axis=-1)
                return (h + z @ _wk(lp["wout"]) + lp["wout"]["bias"],
                        (fkl, fvl))
            attn = attn @ _wk(lp["dense"]) + lp["dense"]["bias"]
            return h + attn + mlp, (fkl, fvl)

        h, (fk, fv) = jax.lax.scan(
            layer, h, (p["layers"], (cache_k, cache_v), (fk, fv)),
            unroll=llm.scan_unroll)
        h = layer_norm(h, p["final_ln"]["scale"], p["final_ln"]["bias"],
                       llm.layer_norm_eps)
        logits = h @ _wk(p["lm_head"]) + p["lm_head"]["bias"]
        return logits, fk, fv

    return fwd, fresh_shape


def make_v2_window_forward(llm, *, slots: int, cap: int, Fcap: int, dtype):
    """Chunk-local forward over a token window for the v2 (Qwen2/GQA)
    tower.  Same contract as make_v1_window_forward; p is the qwen2
    param tree (params["showo"]).  Decode rows are pure-causal
    (show_o2 decode sits after every span), so the two-piece bias is
    exactly the naive step's kpos < lens + r + 1 split at lens0."""
    from showo_tpu.show_o2.qwen2 import (_mlp, _wk as qwk, apply_rope_full,
                                         rms_norm, rope_tables)
    import math

    H, Hkv, Dh, D = llm.num_heads, llm.num_kv_heads, llm.head_dim, \
        llm.hidden_size
    G = H // Hkv
    fresh_shape = (llm.num_layers, slots, Fcap, Hkv, Dh)

    def fwd(p, window, lens0, lens, cache_k, cache_v, fk, fv):
        W = window.shape[1]
        off = lens - lens0
        h = p["embed"][window]
        pos = lens[:, None] + jnp.arange(W)[None, :]
        cos, sin = rope_tables(pos, Dh, llm.rope_theta)
        kpos = jnp.arange(cap)[None, None, None, None, :]
        big_bias = jnp.where(kpos < lens0[:, None, None, None, None],
                             0.0, NEG_INF)           # [slots,1,1,1,cap]
        jpos = jnp.arange(Fcap)[None, None, None, None, :]
        rrows = jnp.arange(W)[None, None, None, :, None]
        fresh_bias = jnp.where(
            jpos < off[:, None, None, None, None] + rrows + 1, 0.0,
            NEG_INF)                                 # [slots,1,1,W,Fcap]
        wr = jax.vmap(
            lambda f, x, o: jax.lax.dynamic_update_slice(f, x, (o, 0, 0)))

        def layer(h, xs):
            lp, (ckl, cvl), (fkl, fvl) = xs
            x = rms_norm(h, lp["input_ln"]["scale"], llm.rms_norm_eps)
            if "qkv" in lp:
                qkv = x @ qwk(lp["qkv"]) + lp["qkv"]["bias"]
                q = qkv[..., :H * Dh].reshape(slots, W, H, Dh)
                k = qkv[..., H * Dh:(H + Hkv) * Dh].reshape(
                    slots, W, Hkv, Dh)
                v = qkv[..., (H + Hkv) * Dh:].reshape(slots, W, Hkv, Dh)
            else:
                q = (x @ qwk(lp["q"]) + lp["q"]["bias"]).reshape(
                    slots, W, H, Dh)
                k = (x @ qwk(lp["k"]) + lp["k"]["bias"]).reshape(
                    slots, W, Hkv, Dh)
                v = (x @ qwk(lp["v"]) + lp["v"]["bias"]).reshape(
                    slots, W, Hkv, Dh)
            q, k = apply_rope_full(q, k, cos, sin)
            fkl = wr(fkl, k.astype(fkl.dtype), off)
            fvl = wr(fvl, v.astype(fvl.dtype), off)
            qg = q.reshape(slots, W, Hkv, G, Dh)
            if isinstance(ckl, tuple):
                # int8 GQA cache: same score/prob scale folding as the v1
                # path (k-scales on the scores post-dot, v-scales on the
                # probs pre-dot) — see the module comment above
                (ckq, cks), (cvq, cvs) = ckl, cvl
                s1 = jnp.einsum("bqhgd,bkhd->bhgqk", qg,
                                ckq.astype(qg.dtype),
                                preferred_element_type=jnp.float32) \
                    / math.sqrt(Dh)
                s1 = s1 * cks.transpose(0, 2, 1)[:, :, None, None, :]
                s2 = jnp.einsum("bqhgd,bkhd->bhgqk", qg, fkl,
                                preferred_element_type=jnp.float32) \
                    / math.sqrt(Dh)
                s = jnp.concatenate([s1 + big_bias, s2 + fresh_bias],
                                    axis=-1)
                pr = jax.nn.softmax(s, axis=-1)
                pr_big = (pr[..., :cap]
                          * cvs.transpose(0, 2, 1)[:, :, None, None, :]
                          ).astype(h.dtype)
                attn = (jnp.einsum("bhgqk,bkhd->bqhgd", pr_big,
                                   cvq.astype(h.dtype))
                        + jnp.einsum("bhgqk,bkhd->bqhgd",
                                     pr[..., cap:].astype(fvl.dtype), fvl)
                        ).reshape(slots, W, H * Dh)
            else:
                s1 = jnp.einsum("bqhgd,bkhd->bhgqk", qg, ckl,
                                preferred_element_type=jnp.float32) \
                    / math.sqrt(Dh)
                s2 = jnp.einsum("bqhgd,bkhd->bhgqk", qg, fkl,
                                preferred_element_type=jnp.float32) \
                    / math.sqrt(Dh)
                s = jnp.concatenate([s1 + big_bias, s2 + fresh_bias],
                                    axis=-1)
                pr = jax.nn.softmax(s, axis=-1).astype(cvl.dtype)
                attn = (jnp.einsum("bhgqk,bkhd->bqhgd", pr[..., :cap], cvl)
                        + jnp.einsum("bhgqk,bkhd->bqhgd", pr[..., cap:], fvl)
                        ).reshape(slots, W, H * Dh)
            h = h + attn @ qwk(lp["o"])
            x2 = rms_norm(h, lp["post_ln"]["scale"], llm.rms_norm_eps)
            return h + _mlp(llm, lp, x2), (fkl, fvl)

        h, (fk, fv) = jax.lax.scan(
            layer, h, (p["layers"], (cache_k, cache_v), (fk, fv)),
            unroll=llm.scan_unroll)
        h = rms_norm(h, p["final_ln"]["scale"], llm.rms_norm_eps)
        head = qwk(p["lm_head"]) if "lm_head" in p else p["embed"].T
        logits = h @ head
        return logits, fk, fv

    return fwd, fresh_shape


def build_v2_decode_chunk(server, llm, *, slots: int, cap: int, chunk: int,
                          dtype, temperature: float, top_k, top_p):
    """Chunk-local plain decode for Showo2MMUServer (the v2 analog of
    build_v1_decode_chunk): W=1 windows, fresh rows at offset i, one
    scatter per chunk.  Replaces the naive step that materialized the
    full GQA cache every iteration."""
    fwd, fresh_shape = make_v2_window_forward(
        llm, slots=slots, cap=cap, Fcap=chunk, dtype=dtype)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def decode_chunk(params, cache_k, cache_v, lengths, tok, key):
        p = params["showo"]
        fk0 = jnp.zeros(fresh_shape, dtype)
        fv0 = jnp.zeros(fresh_shape, dtype)

        def step(carry, i):
            fk, fv, tok, key = carry
            key, k1 = jax.random.split(key)
            logits, fk, fv = fwd(p, tok[:, None], lengths, lengths + i,
                                 cache_k, cache_v, fk, fv)
            nxt = _sample_logits(k1, logits[:, -1], temperature, top_k,
                                 None, top_p).astype(jnp.int32)
            return (fk, fv, nxt, key), nxt

        (fk, fv, cur, key), toks = jax.lax.scan(
            step, (fk0, fv0, tok, key), jnp.arange(chunk))
        cache_k, cache_v = scatter_fresh(cache_k, cache_v, fk, fv, lengths)
        return (cache_k, cache_v, lengths + chunk, cur, key,
                toks[..., None], jnp.ones_like(toks))

    return lambda *a: decode_chunk(server.params, *a)
