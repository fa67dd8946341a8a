"""Probe: fused admission step vs (standalone prefill + decode step).

Measures, at the serving bench shape (slots=8, cap=512, bucket=384,
v1 1.3B bf16 fuse_parallel_mlp):
  * one decode step (the chunk program amortized),
  * one standalone prefill dispatch,
  * one fused-admit dispatch,
and reports whether the fused step actually shares the weight stream
(fused ≈ max(prefill, decode)) or degenerates to the sum.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import fuse_parallel_mlp, quantize_int8
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.serving import ShowoMMUServer


def _drain(out):
    # axon tunnel: block_until_ready can return before remote compute
    # finishes; a device_get of a scalar derived from the output is a
    # real sync (device executes programs in dispatch order)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    jax.device_get(jnp.sum(leaf))


def bench(fn, *args, iters=20):
    _drain(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(int8=False):
    cfg = ShowoConfig()
    params = jax.jit(lambda k: init_showo_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    if int8:
        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))
    slots, cap, bucket = 8, 512, 384
    server = ShowoMMUServer(cfg, params, slots=slots, cap=cap, chunk=16,
                            buckets=(bucket,), temperature=1.0, top_k=1,
                            fused_admit=True)
    eng = server.engine
    rng = np.random.default_rng(0)
    SOI, EOI, MMU = 50296, 50297, 50300
    img = rng.integers(50305, 58497, size=256)
    q = rng.integers(2, 50000, size=60)
    prompt = np.concatenate([[MMU, SOI], img, [EOI], q]).astype(np.int32)
    padded = np.zeros((1, bucket), np.int32)
    padded[0, :len(prompt)] = prompt
    S = jnp.asarray(len(prompt), jnp.int32)
    slot = jnp.asarray(0, jnp.int32)
    lens = jnp.asarray(np.full(slots, 300, np.int32))
    cur = jnp.zeros(slots, jnp.int32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    pj = jnp.asarray(padded)

    # NOTE: cache buffers are donated; clone per call via +0
    def run_prefill():
        return eng._prefill(bucket)(eng.cache_k + 0, eng.cache_v + 0,
                                    pj, S, slot, k1)

    def run_chunk():
        return eng._decode_chunk(eng.cache_k + 0, eng.cache_v + 0, lens,
                                 cur, k1)

    def run_fused():
        return eng._fused(bucket)(eng.cache_k + 0, eng.cache_v + 0, lens,
                                  cur, pj, S, slot, k1, k2)

    clone_ms = bench(lambda: (eng.cache_k + 0, eng.cache_v + 0))
    prefill_ms = bench(run_prefill) - clone_ms
    chunk_ms = bench(run_chunk) - clone_ms
    fused_ms = bench(run_fused) - clone_ms
    step_ms = chunk_ms / 16
    print(f"int8={int8} cache-clone overhead {clone_ms:.2f} ms (subtracted)")
    print(f"prefill(bucket=384)      {prefill_ms:7.2f} ms")
    print(f"decode chunk (16 steps)  {chunk_ms:7.2f} ms -> {step_ms:.2f}/step")
    print(f"fused admit step         {fused_ms:7.2f} ms")
    print(f"  vs sequential (prefill + 1 step): {prefill_ms + step_ms:7.2f} ms"
          f" -> saving {(prefill_ms + step_ms - fused_ms):.2f} ms/admission")


if __name__ == "__main__":
    import sys
    main(int8="int8" in sys.argv[1:])
