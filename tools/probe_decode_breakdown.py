"""Ablation probe: where do the cached-MaskGIT decode milliseconds go?

Times one phi_forward decode step (Q image rows attending to the full
prefix cache) under surgical ablations — each isolates one suspected
overhead (fp32 score cast, qk-layernorm, RoPE, cache update, attention
entirely, lm-head).  Run on the real chip:

    python tools/probe_decode_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from showo_tpu.models.phi import KVCache, PhiConfig, fuse_qkv
from showo_tpu.models.showo import ShowoConfig, init_showo_params


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.astype(jnp.float32).sum())


def bench(fn, *args, iters=30):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = ShowoConfig()
    B, P = 4, 131            # batch 2 x CFG, prefix 130 text + task
    Q = 1 + cfg.num_vq_tokens + 1   # soi + 256 + eoi
    L = P + Q
    D = cfg.llm.hidden_size

    params = jax.jit(lambda k: init_showo_params(
        cfg, k, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_qkv(params["showo"]))
    jax.block_until_ready(params)

    ids = jnp.zeros((B, Q), jnp.int32)
    bias = jnp.zeros((B, 1, Q, L), jnp.bfloat16)
    cache = KVCache.zeros(cfg.llm, B, L, dtype=jnp.bfloat16)
    cache = KVCache(cache.k, cache.v, jnp.asarray(P, jnp.int32))
    head_slice = (1, 1 + cfg.num_vq_tokens, cfg.codebook_offset,
                  cfg.codebook_offset + cfg.codebook_size)

    import dataclasses

    from showo_tpu.models import phi as phimod

    def run(llm_cfg, label, head=True, attn="full", ln_qk=True, rope=True,
            cache_upd=True):
        orig_attention = phimod._attention
        orig_ln = phimod.layer_norm
        orig_rope = phimod.apply_rope

        if attn == "skip":
            phimod._attention = lambda q, k, v, *a, **kw: q
        if not ln_qk:
            # keep the big input LN (D=2048) but skip per-head q/k LNs
            calls = {"n": 0}
            def ln(x, scale, bias_, eps):
                if x.ndim == 4:  # [B,S,H,Dh] per-head LN
                    return x
                return orig_ln(x, scale, bias_, eps)
            phimod.layer_norm = ln
        if not rope:
            phimod.apply_rope = lambda q, k, cos, sin, rd: (q, k)

        scfg = dataclasses.replace(cfg, llm=llm_cfg)

        @jax.jit
        def step(params, ids, bias, cache):
            logits, _ = phimod.phi_forward(
                scfg.llm, params["showo"], input_ids=ids,
                attention_bias=bias, cache=cache,
                lm_head_slice=head_slice if head else None)
            return logits

        try:
            ms = bench(step, params, ids, bias, cache)
        finally:
            phimod._attention = orig_attention
            phimod.layer_norm = orig_ln
            phimod.apply_rope = orig_rope
        print(f"{label:42s} {ms:7.2f} ms")
        return ms

    # production round-2 path: fused parallel-residual layer + static
    # prefix decode (what bench.py's 339 img/min actually runs)
    from showo_tpu.models.phi import fuse_parallel_mlp

    params_fused = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    llm24 = dataclasses.replace(cfg.llm, scan_unroll=24)

    @jax.jit
    def step_prod(params, ids, bias, cache):
        logits, _ = phimod.phi_forward(
            llm24, params["showo"], input_ids=ids,
            attention_bias=bias, cache=cache,
            lm_head_slice=head_slice, static_prefix_len=P)
        return logits

    ms = bench(step_prod, params_fused, ids, bias, cache)
    print(f"{'PRODUCTION (fused mlp + static prefix)':42s} {ms:7.2f} ms")

    llm = dataclasses.replace(cfg.llm, scan_unroll=24)
    base = run(llm, "baseline (fp32 scores, unroll 24)")
    run(dataclasses.replace(llm, attn_fp32=False), "bf16 scores")
    run(llm, "no qk-layernorm", ln_qk=False)
    run(llm, "no rope", rope=False)
    run(llm, "no attention (q passthrough)", attn="skip")
    run(llm, "no lm head", head=False)
    run(dataclasses.replace(llm, scan_unroll=1), "scan unroll 1")

    # pure matmul floor: the same weights driven as back-to-back matmuls
    W = params["showo"]["layers"]
    x0 = jnp.zeros((B * Q, D), jnp.bfloat16)

    @jax.jit
    def floor(x, W):
        def layer(x, w):
            y = x @ w["qkv"]["kernel"]
            y = y[:, :D] @ w["dense"]["kernel"]
            z = x @ w["fc1"]["kernel"]
            z = z @ w["fc2"]["kernel"]
            return x + y + z, None
        x, _ = jax.lax.scan(layer, x, W, unroll=24)
        return x

    ms = bench(floor, x0, W)
    print(f"{'pure-matmul floor (same weights)':42s} {ms:7.2f} ms")
    print(f"baseline/floor = {base/ms:.2f}x")


if __name__ == "__main__":
    main()
