"""Probe: where does the continuous-batching decode step's time go?

bench.py metric=serve measured the slot engine at 253.9 tok/s aggregate
while STATIC B=8 decode (showo_mmu_generate) delivers ~508 tok/s-worth
of steps — the engine's per-step cost is ~2x.  Candidate costs:

  A. per-lane vmapped dynamic_update_slice cache writes (full-cache
     copy per layer per step if XLA fails to alias in place)
  B. shared-offset dynamic_update_slice (same write, scalar index)
  C. the static_prefix concat decode showo_mmu_generate uses (the known
     fast path; cannot serve per-lane lengths)

All three run the same 24-layer forward at B=8, S=1, cap=512, and the
same full-cap length bias, isolating the cache-write strategy.

Run:  python tools/probe_serving_decode.py [slots=8] [cap=512] [chunk=16]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import KVCache, fuse_parallel_mlp
from showo_tpu.models.showo import ShowoConfig, init_showo_params, showo_forward
from showo_tpu.ops.masks import NEG_INF


def bench_carry(fn, params, ck, cv, lens, tok, key, iters=5):
    """fn donates ck/cv; thread the returned buffers through the loop."""
    ck, cv, lens2, tok2 = fn(params, ck, cv, lens, tok, key)
    jax.block_until_ready((ck, cv))
    t0 = time.perf_counter()
    for _ in range(iters):
        ck, cv, lens2, tok2 = fn(params, ck, cv, lens, tok, key)
    jax.block_until_ready((ck, cv))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    slots = int(args.get("slots", 8))
    cap = int(args.get("cap", 512))
    chunk = int(args.get("chunk", 16))
    cfg = ShowoConfig()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=24))
    dtype = jnp.bfloat16
    params = jax.jit(lambda k: init_showo_params(cfg, k, dtype))(
        jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    L, H, Dh = cfg.llm.num_layers, cfg.llm.num_heads, cfg.llm.head_dim

    shape = (L, slots, cap, H, Dh)
    ck = jnp.zeros(shape, dtype)
    cv = jnp.zeros(shape, dtype)
    lens_vec = jnp.asarray(np.full(slots, 300, np.int32))
    tok = jnp.zeros((slots,), jnp.int32)
    kpos = jnp.arange(cap)[None, None, None, :]

    def chunk_loop(step):
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def run(params, ck, cv, lens, tok, key):
            def body(carry, _):
                return step(params, carry)
            (ck2, cv2, lens2, tok2, key2), _ = jax.lax.scan(
                body, (ck, cv, lens, tok, key), None, length=chunk)
            return ck2, cv2, lens2, tok2
        return run

    # A: per-lane vector lengths (the serving engine's step)
    def step_vec(params, carry):
        ck, cv, lens, tok, key = carry
        key, k1 = jax.random.split(key)
        bias = jnp.where(kpos < (lens[:, None, None, None] + 1), 0.0,
                         NEG_INF).astype(dtype)
        logits, cache = showo_forward(cfg, params, input_ids=tok[:, None],
                                      attention_bias=bias,
                                      cache=KVCache(ck, cv, lens))
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (cache.k, cache.v, cache.length, nxt, key), None

    t = bench_carry(chunk_loop(step_vec), params, ck, cv, lens_vec, tok,
                    jax.random.PRNGKey(0))
    print(f"A per-lane lengths DUS:   {t / chunk:7.2f} ms/step "
          f"({slots * 1e3 / (t / chunk):6.0f} tok/s)")

    # B: shared scalar length, same dynamic_update_slice write path
    def step_scalar(params, carry):
        ck, cv, lens, tok, key = carry
        key, k1 = jax.random.split(key)
        bias = jnp.where(kpos < (lens + 1), 0.0, NEG_INF).astype(dtype)
        logits, cache = showo_forward(cfg, params, input_ids=tok[:, None],
                                      attention_bias=bias,
                                      cache=KVCache(ck, cv, lens))
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (cache.k, cache.v, cache.length, nxt, key), None

    ck = jnp.zeros(shape, dtype)
    cv = jnp.zeros(shape, dtype)
    t = bench_carry(chunk_loop(step_scalar), params, ck, cv,
                    jnp.asarray(300, jnp.int32), tok, jax.random.PRNGKey(0))
    print(f"B scalar length DUS:      {t / chunk:7.2f} ms/step "
          f"({slots * 1e3 / (t / chunk):6.0f} tok/s)")

    # C: static-prefix concat decode (showo_mmu_generate's fast path):
    # prefix K/V loop-invariant, fresh rows concat per step
    prefix = 300

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def run_concat(params, ck, cv, tok, key):
        pk = ck[:, :, :prefix]
        pv = cv[:, :, :prefix]

        def body(carry, _):
            tok, key, nk, nv = carry
            key, k1 = jax.random.split(key)
            cache = KVCache(jnp.concatenate([pk, nk], 2),
                            jnp.concatenate([pv, nv], 2),
                            jnp.asarray(prefix, jnp.int32) + nk.shape[2])
            S_all = cache.k.shape[2]
            bias = jnp.zeros((1, 1, 1, S_all), dtype)
            logits, cache2 = showo_forward(
                cfg, params, input_ids=tok[:, None], attention_bias=bias,
                cache=KVCache(cache.k, cache.v, cache.length),
                static_prefix_len=S_all)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            nk2 = cache2.k[:, :, S_all:]
            return (nxt, key, jnp.concatenate([nk, nk2], 2),
                    jnp.concatenate([nv, cache2.v[:, :, S_all:]], 2)), None

        nk = jnp.zeros((L, slots, 0, H, Dh), dtype)
        nv = jnp.zeros((L, slots, 0, H, Dh), dtype)
        # concat decode grows shapes per step -> unrolled python loop
        carry = (tok, key, nk, nv)
        for _ in range(chunk):
            carry, _ = body(carry, None)
        return carry[0]

    if args.get("concat", "0") != "0":  # chunk-unrolled: slow compile
        try:
            ck = jnp.zeros(shape, dtype)
            cv = jnp.zeros(shape, dtype)
            out = run_concat(params, ck, cv, tok, jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                ck = jnp.zeros(shape, dtype)
                cv = jnp.zeros(shape, dtype)
                out = run_concat(params, ck, cv, tok, jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            t = (time.perf_counter() - t0) / iters * 1e3
            print(f"C static-prefix concat:   {t / chunk:7.2f} ms/step "
                  f"({slots * 1e3 / (t / chunk):6.0f} tok/s)")
        except Exception as e:
            print(f"C static-prefix concat: failed "
                  f"({type(e).__name__}: {str(e)[:160]})")


if __name__ == "__main__":
    main()
