"""A/B the v2 chunk-local decode chunk vs a naive qwen2_forward chunk
at the serving shape (slots=8, cap=976, chunk=16, 1.5B int8)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.qwen2 import (Qwen2Config, Qwen2KVCache,
                                     init_qwen2_params, fuse_inference,
                                     quantize_int8, qwen2_forward)
from showo_tpu.serving.decode_chunk import make_v2_window_forward, scatter_fresh
from showo_tpu.sampling.ar import _sample_logits
from showo_tpu.ops.masks import NEG_INF


import numpy as np


def bench(fn, *args, iters=5):
    # sync via host fetch: block_until_ready is unreliable on tunneled
    # backends (see bench.py)
    out = fn(*args)
    np.asarray(out[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[1])
    return (time.perf_counter() - t0) / iters


def main():
    llm = Qwen2Config()
    slots, cap, chunk = 8, 976, 16
    dtype = jnp.bfloat16
    params = jax.jit(lambda k: init_qwen2_params(llm, k, dtype))(
        jax.random.PRNGKey(0))
    params = fuse_inference(params)
    params = jax.jit(quantize_int8)(params)
    L, Hkv, Dh = llm.num_layers, llm.num_kv_heads, llm.head_dim
    ck = jnp.zeros((L, slots, cap, Hkv, Dh), dtype)
    cv = jnp.zeros((L, slots, cap, Hkv, Dh), dtype)
    lens = jnp.full((slots,), 700, jnp.int32)
    tok = jnp.zeros((slots,), jnp.int32)

    fwd, fresh_shape = make_v2_window_forward(
        llm, slots=slots, cap=cap, Fcap=chunk, dtype=dtype)

    @jax.jit
    def chunk_local(params, ck, cv, lens, tok, key):
        fk0 = jnp.zeros(fresh_shape, dtype)
        fv0 = jnp.zeros(fresh_shape, dtype)

        def step(carry, i):
            fk, fv, tok, key = carry
            key, k1 = jax.random.split(key)
            logits, fk, fv = fwd(params, tok[:, None], lens, lens + i,
                                 ck, cv, fk, fv)
            nxt = _sample_logits(k1, logits[:, -1], 1.0, 1, None,
                                 None).astype(jnp.int32)
            return (fk, fv, nxt, key), nxt

        (fk, fv, cur, key), toks = jax.lax.scan(
            step, (fk0, fv0, tok, key), jnp.arange(chunk))
        nck, ncv = scatter_fresh(ck, cv, fk, fv, lens)
        return toks, nck[0, 0, 0, 0, 0]

    @jax.jit
    def naive(params, ck, cv, lens, tok, key):
        kpos = jnp.arange(cap)[None, None, None, :]
        embed = params["embed"]

        def step(carry, _):
            ck, cv, lens_, tok, key = carry
            key, k1 = jax.random.split(key)
            bias = jnp.where(kpos < (lens_[:, None, None, None] + 1), 0.0,
                             NEG_INF).astype(dtype)
            logits, _, cache = qwen2_forward(
                llm, params, input_embeds=embed[tok[:, None]],
                attention_bias=bias, cache=Qwen2KVCache(ck, cv, lens_),
                position_ids=lens_[:, None], cache_offsets=lens_)
            nxt = _sample_logits(k1, logits[:, -1], 1.0, 1,
                                 None, None).astype(jnp.int32)
            return (cache.k, cache.v, cache.length, nxt, key), nxt

        (ck, cv, lens_, cur, key), toks = jax.lax.scan(
            step, (ck, cv, lens, tok, key), None, length=chunk)
        return toks, ck[0, 0, 0, 0, 0]

    key = jax.random.PRNGKey(1)
    t_local = bench(chunk_local, params, ck, cv, lens, tok, key)
    print(f"chunk_local: {t_local*1000:.1f} ms/chunk "
          f"({t_local/chunk*1000:.2f} ms/step)")
    t_naive = bench(naive, params, ck, cv, lens, tok, key)
    print(f"naive:       {t_naive*1000:.1f} ms/chunk "
          f"({t_naive/chunk*1000:.2f} ms/step)")


if __name__ == "__main__":
    main()
