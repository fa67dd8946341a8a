"""Hypothesis probe: the serving decode step's cost is dominated by the
per-step full-cache materialization (lax.scan over layers carries the
805 MB cache through xs->ys, which XLA copies every step), not by weight
or cache READS.

Ablations at the serving shape (slots=8, cap=512, 1.3B bf16 fused-mlp):
  A. production decode chunk (scatter into cache per layer per step)
  B. read-only cache: attention over the big cache ONLY (no scatter, no
     ys) — wrong results, correct traffic for the read side
  C. B plus fresh-rows side buffer [slots, chunk] (the chunk-local
     append scheme's traffic)
If B/C ~= weights-bound (~6 ms/step) while A is 16 ms, the chunk-local
fresh-KV decode is a ~2.5x serving lever.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import (KVCache, _attention, _rope_tables, _wk,
                                  apply_rope, fuse_parallel_mlp, layer_norm)
from showo_tpu.models.showo import ShowoConfig, init_showo_params, showo_forward
from showo_tpu.ops.masks import NEG_INF
from showo_tpu.sampling.ar import _sample_logits


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    jax.device_get(jnp.sum(leaf))


def bench(fn, *args, iters=10):
    drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = ShowoConfig()
    llm = cfg.llm
    params = jax.jit(lambda k: init_showo_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    slots, cap, chunk = 8, 512, 16
    H, Dh, D = llm.num_heads, llm.head_dim, llm.hidden_size
    dtype = jnp.bfloat16
    shape = (llm.num_layers, slots, cap, H, Dh)
    ck = jnp.zeros(shape, dtype)
    cv = jnp.zeros(shape, dtype)
    lens = jnp.asarray(np.full(slots, 300, np.int32))
    tok = jnp.zeros(slots, jnp.int32)
    key = jax.random.PRNGKey(1)

    # A: production chunk
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def chunk_a(params, ck, cv, lens, tok, key):
        kpos = jnp.arange(cap)[None, None, None, :]

        def step(carry, _):
            ck, cv, lens, tok, key = carry
            key, k1 = jax.random.split(key)
            bias = jnp.where(kpos < (lens[:, None, None, None] + 1), 0.0,
                             NEG_INF).astype(dtype)
            logits, cache = showo_forward(cfg, params, input_ids=tok[:, None],
                                          attention_bias=bias,
                                          cache=KVCache(ck, cv, lens))
            nxt = _sample_logits(k1, logits[:, -1], 1.0, 1, None, None)
            return ((cache.k, cache.v, cache.length, nxt.astype(jnp.int32),
                     key), nxt)

        (ck, cv, lens, tok, key), toks = jax.lax.scan(
            step, (ck, cv, lens, tok, key), None, length=chunk)
        return ck, cv, toks

    # B: read-only big cache (no scatter, no ys) — traffic probe only
    @jax.jit
    def chunk_b(params, ck, cv, lens, tok, key):
        p = params["showo"]
        kpos = jnp.arange(cap)[None, None, None, :]

        def step(carry, _):
            tok, key = carry
            key, k1 = jax.random.split(key)
            bias = jnp.where(kpos < lens[:, None, None, None], 0.0,
                             NEG_INF).astype(dtype)
            h = p["embed"][tok][:, None]
            pos = lens[:, None]
            cos, sin = _rope_tables(pos, llm.rotary_dim, llm.rope_theta)

            def layer(h, xs):
                lp, (ckl, cvl) = xs
                x = layer_norm(h, lp["ln"]["scale"], lp["ln"]["bias"],
                               llm.layer_norm_eps)
                y = x @ _wk(lp["win"]) + lp["win"]["bias"]
                qkv, mlp_pre = y[..., :3 * D], y[..., 3 * D:]
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(slots, 1, H, Dh)
                q = layer_norm(q, lp["q_ln"]["scale"], lp["q_ln"]["bias"],
                               llm.layer_norm_eps)
                k_ = layer_norm(k.reshape(slots, 1, H, Dh),
                                lp["k_ln"]["scale"], lp["k_ln"]["bias"],
                                llm.layer_norm_eps)
                q, k_ = apply_rope(q, k_, cos, sin, llm.rotary_dim)
                attn = _attention(q, ckl, cvl, bias)
                z = jnp.concatenate(
                    [attn.reshape(slots, 1, D),
                     jax.nn.gelu(mlp_pre, approximate=True)], axis=-1)
                return h + z @ _wk(lp["wout"]) + lp["wout"]["bias"], None

            h, _ = jax.lax.scan(layer, h, (p["layers"], (ck, cv)))
            h = layer_norm(h, p["final_ln"]["scale"], p["final_ln"]["bias"],
                           llm.layer_norm_eps)
            logits = h[:, -1] @ _wk(p["lm_head"]) + p["lm_head"]["bias"]
            nxt = _sample_logits(k1, logits, 1.0, 1, None, None)
            return (nxt.astype(jnp.int32), key), nxt

        (tok, key), toks = jax.lax.scan(step, (tok, key), None, length=chunk)
        return toks

    a = bench(lambda: chunk_a(params, ck + 0, cv + 0, lens, tok, key))
    b = bench(lambda: chunk_b(params, ck, cv, lens, tok, key))
    clone = bench(lambda: (ck + 0, cv + 0))
    print(f"A production chunk (16 steps): {a - clone:7.1f} ms "
          f"({(a - clone) / chunk:.2f}/step, cache-clone {clone:.1f} excl)")
    print(f"B read-only cache  (16 steps): {b:7.1f} ms ({b / chunk:.2f}/step)")


if __name__ == "__main__":
    main()
