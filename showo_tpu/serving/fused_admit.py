"""Fused admission step: prefill a new request INSIDE a decode step.

The serving engine's remaining stall (STATUS round-3 notes): admitting a
request dispatches a standalone prefill program (~25 ms for a 384-row
bucket through the 24-layer v1 tower) during which every decode lane
idles — ~10% of wall on the mixed-budget benchmark.

Classic vLLM-style *chunked* prefill is unsound for Show-o's sequence
layout: the image span attends bidirectionally (ops/masks.py
omni_mask_mmu, reference prompting_utils.py ``create_attention_mask_for_
mmu``), so a prompt row's K/V depends on LATER rows of the same span —
prefill cannot be split below span granularity.  What IS sound, and fits
the TPU cost model better, is fusing the WHOLE prefill into one decode
step:

  * Both programs are weight-bandwidth-bound at serving shapes (2.6 GB
    of bf16 weights per step vs ~0.7 TFLOP of row compute), so running
    the prefill's ``bucket`` rows through the SAME per-layer matmuls as
    the decode lanes' rows shares one weight stream instead of paying
    two.  Measured: the fused step costs ~the max of the two programs,
    not the sum.
  * Row-wise ops (layernorm, the fused win/wout matmuls, qk-LN, RoPE,
    gelu) are batch-position-agnostic: the decode lanes' ``slots`` rows
    and the prefill's ``bucket`` rows concatenate into one [slots+bucket,
    D] row block for every matmul.  Only attention differs — decode rows
    attend to their own lane's cache, prefill rows attend within the
    padded prompt under the omni mask — and the two attention calls are
    exactly the math the separate programs would do, so the fused step
    is bit-identical to (prefill; one decode step) run sequentially.
  * Cache-write ordering makes the admitted lane safe: the decode half
    scatters a garbage row at position 0 of the (empty, length-pinned-0)
    admitted lane, then the prefill half overwrites positions [0,
    bucket) — and the decode biases of OTHER lanes never reach into the
    admitted lane, so nothing observes the garbage.

The engine dispatches this step once per admission when at least one
lane is mid-decode; idle-only admissions (initial fill) keep the plain
prefill program.  Requires fuse_parallel_mlp params ("win"/"wout"
layout) — the serving default; int8 serving params ride through _wk.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import (_attention, _cache_scatter, _rope_tables,
                                  _wk, apply_rope, layer_norm)
from showo_tpu.ops.masks import NEG_INF, omni_mask_mmu
from showo_tpu.sampling.ar import _sample_logits


def build_v1_fused_admit(server, cfg, *, dtype, eoi: int, cap: int,
                         temperature: float, top_k: Optional[int],
                         top_p: Optional[float]):
    """Returns fused_admit_for(bucket) -> fn(cache_k, cache_v, lengths,
    cur_tok, padded [1, bucket] ids, true_len, slot, k_decode, k_prefill)
    -> (cache_k, cache_v, cur_tok', decode_toks [slots], tok0).

    Decode-half semantics match ShowoMMUServer.decode_chunk for ONE step;
    prefill-half semantics match its prefill program.  Lanes with
    length 0 (idle + the lane being admitted) produce garbage decode
    tokens the host discards; their cur_tok is held, except the admitted
    slot which becomes tok0.
    """
    llm = cfg.llm
    H, Dh, D = llm.num_heads, llm.head_dim, llm.hidden_size
    sm_dtype = jnp.float32 if llm.attn_fp32 else jnp.bfloat16

    def make(bucket: int):
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def fused(params, cache_k, cache_v, lengths, cur_tok, padded,
                  true_len, slot, k_dec, k_pre):
            p = params["showo"]
            assert "win" in p["layers"], \
                "fused admission requires fuse_parallel_mlp params"
            slots = lengths.shape[0]
            dec_emb = p["embed"][cur_tok]            # [slots, D]
            pre_emb = p["embed"][padded[0]]          # [bucket, D]
            h = jnp.concatenate([dec_emb, pre_emb], axis=0)[None]  # [1,N,D]
            positions = jnp.concatenate(
                [lengths, jnp.arange(bucket, dtype=jnp.int32)])
            cos, sin = _rope_tables(positions[None, :], llm.rotary_dim,
                                    llm.rope_theta)

            kpos = jnp.arange(cap)[None, None, None, :]
            dec_bias = jnp.where(
                kpos < (lengths[:, None, None, None] + 1), 0.0, NEG_INF
            ).astype(dtype)
            pre_bias = omni_mask_mmu(padded, eoi_id=eoi, dtype=dtype)
            cols = jnp.arange(bucket)[None, None, None, :]
            pre_bias = jnp.where(cols < true_len, pre_bias, NEG_INF)

            def body(hc, xs):
                lp, (ck, cv) = xs                    # ck: [slots,cap,H,Dh]
                x = layer_norm(hc, lp["ln"]["scale"], lp["ln"]["bias"],
                               llm.layer_norm_eps)
                y = x @ _wk(lp["win"]) + lp["win"]["bias"]
                qkv, mlp_pre = y[..., :3 * D], y[..., 3 * D:]
                q, k, v = jnp.split(qkv, 3, axis=-1)
                N = q.shape[1]
                q = q.reshape(1, N, H, Dh)
                k = k.reshape(1, N, H, Dh)
                v = v.reshape(1, N, H, Dh)
                q = layer_norm(q, lp["q_ln"]["scale"], lp["q_ln"]["bias"],
                               llm.layer_norm_eps)
                k = layer_norm(k, lp["k_ln"]["scale"], lp["k_ln"]["bias"],
                               llm.layer_norm_eps)
                q, k = apply_rope(q, k, cos, sin, llm.rotary_dim)
                # decode rows: one per lane, against the lane's cache
                qd = q[0, :slots][:, None]           # [slots, 1, H, Dh]
                kd = k[0, :slots][:, None]
                vd = v[0, :slots][:, None]
                ck, cv = _cache_scatter(ck, cv, kd, vd, lengths)
                attn_d = _attention(qd, ck, cv, dec_bias,
                                    softmax_dtype=sm_dtype)
                # prefill rows: fresh-only attention under the omni mask,
                # then overwrite the admitted lane's cache (incl. the
                # garbage row the decode scatter just put at position 0)
                qp, kp, vp = q[:, slots:], k[:, slots:], v[:, slots:]
                attn_p = _attention(qp, kp, vp, pre_bias,
                                    softmax_dtype=sm_dtype)
                ck = jax.lax.dynamic_update_slice(
                    ck, kp.astype(ck.dtype), (slot, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vp.astype(cv.dtype), (slot, 0, 0, 0))
                attn = jnp.concatenate(
                    [attn_d.reshape(slots, D), attn_p.reshape(bucket, D)],
                    axis=0)[None]
                z = jnp.concatenate(
                    [attn, jax.nn.gelu(mlp_pre, approximate=True)], axis=-1)
                return hc + z @ _wk(lp["wout"]) + lp["wout"]["bias"], (ck, cv)

            h, (cache_k, cache_v) = jax.lax.scan(
                body, h, (p["layers"], (cache_k, cache_v)),
                unroll=llm.scan_unroll)

            h = layer_norm(h[0], p["final_ln"]["scale"],
                           p["final_ln"]["bias"], llm.layer_norm_eps)
            last_pre = jax.lax.dynamic_index_in_dim(
                h[slots:], true_len - 1, axis=0, keepdims=True)
            rows = jnp.concatenate([h[:slots], last_pre], axis=0)
            logits = rows @ _wk(p["lm_head"]) + p["lm_head"]["bias"]
            nxt = _sample_logits(k_dec, logits[:slots], temperature, top_k,
                                 None, top_p).astype(jnp.int32)
            tok0 = _sample_logits(k_pre, logits[slots:], temperature, top_k,
                                  None, top_p)[0].astype(jnp.int32)
            active = lengths > 0
            cur = jnp.where(active, nxt, cur_tok).at[slot].set(tok0)
            return cache_k, cache_v, cur, nxt, tok0

        return lambda *a: fused(server.params, *a)

    return make


def build_v2_fused_admit(server, cfg, *, dtype, n_img: int, cap: int,
                         temperature: float, top_k: Optional[int],
                         top_p: Optional[float]):
    """Show-o2 analog: the prompt arrives as assembled embeds [1, bucket,
    D] plus the image-span offset (meta), decode lanes ride per-lane GQA
    cache offsets.  Same fusion argument as v1 — Qwen2's layer is
    sequential-residual rather than parallel, but every matmul (qkv, o,
    gate/up, down, tied head) is row-wise, so decode and prefill rows
    share one weight stream and only the two attention calls split."""
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.qwen2 import (_mlp, _wk as _qwk, apply_rope_full,
                                         rms_norm, rope_tables)

    llm = cfg.llm
    H, Hkv, Dh, D = (llm.num_heads, llm.num_kv_heads, llm.head_dim,
                     llm.hidden_size)
    G = H // Hkv

    def _gqa(q, k, v, bias):
        # the dense GQA block of show_o2/qwen2.py::_layer (bf16 operands,
        # fp32 accumulate — bit-identical to the reference's fp32 upcast)
        B, S = q.shape[:2]
        qg = q.reshape(B, S, Hkv, G, Dh)
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                            preferred_element_type=jnp.float32
                            ) / (Dh ** 0.5)
        scores = scores + bias[:, :, None].astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhgqk,bkhd->bqhgd", probs, v
                          ).reshape(B, S, H * Dh)

    def make(bucket: int):
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def fused(params, cache_k, cache_v, lengths, cur_tok, padded_emb,
                  true_len, slot, k_dec, k_pre, img_start):
            p = params["showo"]
            slots = lengths.shape[0]
            dec_emb = p["embed"][cur_tok]                  # [slots, D]
            h = jnp.concatenate([dec_emb, padded_emb[0].astype(dec_emb.dtype)],
                                axis=0)[None]              # [1, N, D]
            positions = jnp.concatenate(
                [lengths, jnp.arange(bucket, dtype=jnp.int32)])
            cos, sin = rope_tables(positions[None, :], Dh, llm.rope_theta)

            kpos = jnp.arange(cap)[None, None, None, :]
            dec_bias = jnp.where(
                kpos < (lengths[:, None, None, None] + 1), 0.0, NEG_INF
            ).astype(dtype)
            mp = jnp.stack([img_start,
                            jnp.full_like(img_start, n_img)])[None, None]
            pre_bias = omni_attn_mask(mp, bucket, dtype=dtype)
            cols = jnp.arange(bucket)[None, None, None, :]
            pre_bias = jnp.where(cols < true_len, pre_bias, NEG_INF)

            def body(hc, xs):
                lp, (ck, cv) = xs                # ck: [slots,cap,Hkv,Dh]
                x = rms_norm(hc, lp["input_ln"]["scale"], llm.rms_norm_eps)
                N = x.shape[1]
                if "qkv" in lp:
                    qkv = x @ _qwk(lp["qkv"]) + lp["qkv"]["bias"]
                    q = qkv[..., :H * Dh].reshape(1, N, H, Dh)
                    k = qkv[..., H * Dh:(H + Hkv) * Dh].reshape(
                        1, N, Hkv, Dh)
                    v = qkv[..., (H + Hkv) * Dh:].reshape(1, N, Hkv, Dh)
                else:
                    q = (x @ _qwk(lp["q"]) + lp["q"]["bias"]
                         ).reshape(1, N, H, Dh)
                    k = (x @ _qwk(lp["k"]) + lp["k"]["bias"]
                         ).reshape(1, N, Hkv, Dh)
                    v = (x @ _qwk(lp["v"]) + lp["v"]["bias"]
                         ).reshape(1, N, Hkv, Dh)
                q, k = apply_rope_full(q, k, cos, sin)
                qd = q[0, :slots][:, None]       # [slots, 1, H, Dh]
                kd = k[0, :slots][:, None]
                vd = v[0, :slots][:, None]
                upd = jax.vmap(lambda c, x_, o: jax.lax.dynamic_update_slice(
                    c, x_, (o, 0, 0)))
                ck = upd(ck, kd.astype(ck.dtype), lengths)
                cv = upd(cv, vd.astype(cv.dtype), lengths)
                attn_d = _gqa(qd, ck, cv, dec_bias)        # [slots, 1, HDh]
                qp, kp, vp = q[:, slots:], k[:, slots:], v[:, slots:]
                attn_p = _gqa(qp, kp, vp, pre_bias)        # [1, bucket, HDh]
                ck = jax.lax.dynamic_update_slice(
                    ck, kp.astype(ck.dtype), (slot, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vp.astype(cv.dtype), (slot, 0, 0, 0))
                attn = jnp.concatenate(
                    [attn_d.reshape(slots, H * Dh),
                     attn_p.reshape(bucket, H * Dh)], axis=0)[None]
                hc = hc + attn @ _qwk(lp["o"])
                x2 = rms_norm(hc, lp["post_ln"]["scale"], llm.rms_norm_eps)
                return hc + _mlp(llm, lp, x2), (ck, cv)

            h, (cache_k, cache_v) = jax.lax.scan(
                body, h, (p["layers"], (cache_k, cache_v)),
                unroll=llm.scan_unroll)

            h = rms_norm(h[0], p["final_ln"]["scale"], llm.rms_norm_eps)
            last_pre = jax.lax.dynamic_index_in_dim(
                h[slots:], true_len - 1, axis=0, keepdims=True)
            rows = jnp.concatenate([h[:slots], last_pre], axis=0)
            head = _qwk(p["lm_head"]) if "lm_head" in p else p["embed"].T
            logits = rows @ head
            nxt = _sample_logits(k_dec, logits[:slots], temperature, top_k,
                                 None, top_p).astype(jnp.int32)
            tok0 = _sample_logits(k_pre, logits[slots:], temperature, top_k,
                                  None, top_p)[0].astype(jnp.int32)
            active = lengths > 0
            cur = jnp.where(active, nxt, cur_tok).at[slot].set(tok0)
            return cache_k, cache_v, cur, nxt, tok0

        return lambda *a: fused(server.params, *a)

    return make


def spec_buf_update(buf, toks, lengths, prompt_row, tok0, slot, true_len):
    """Record a fused-admit step in the speculative token ring.

    The admission rides a PLAIN fused decode step (each active lane
    advances exactly one sampled token, no drafting that step), so the
    ring gets: toks[s] at position lengths[s] + 1 for every active lane
    (ring invariant: buf[len] is the token to feed next), the admitted
    lane's known-id row (padded prompt ids for v1, the -1-masked
    lookup row for v2) at position 0, and its first sampled token at
    true_len.  Idle lanes (length 0, including the admitted slot before
    its overwrite) are untouched.
    """
    active = lengths > 0
    upd = jax.vmap(lambda b, t, ln: jax.lax.dynamic_update_slice(
        b, t[None], (ln + 1,)))(buf, toks, lengths)
    buf = jnp.where(active[:, None], upd, buf)
    buf = jax.lax.dynamic_update_slice(
        buf, prompt_row.astype(jnp.int32)[None], (slot, 0))
    buf = jax.lax.dynamic_update_slice(buf, tok0[None, None],
                                       (slot, true_len))
    return buf
