"""Attention micro-benchmark at the reference harness's exact shapes.

Parity analog of /root/reference/training/omni_attention.py:159-239,
which do_bench's FlexAttention vs SDPA at B=12, S=1152, H=8, D=64 for
the t2i / lm(causal) / mmu / mixed mask families (the reference records
no output values).  Here: the Pallas omni kernel (full-KV and packed
variants) vs XLA dense with the dense omni-mask bias, per mask family,
on the real chip.

Run:  python tools/bench_omni_attention.py [B=12] [S=1152] [H=8] [D=64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PAD, SOI, EOI, MMU = 1, 3, 4, 5


REPS = 32  # applications per compiled program: amortizes the per-
#            dispatch tunnel latency (~28 ms) that would otherwise swamp
#            a sub-ms kernel


def bench(op, q, k, v, iters=5):
    """ms per single attention application; op applied REPS times inside
    one jitted scan (carry = output) so dispatch overhead amortizes."""

    @jax.jit
    def many(q, k, v):
        def body(h, _):
            return op(h, k, v).astype(h.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out

    out = many(q, k, v)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(q, k, v)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters / REPS * 1e3


def main():
    from showo_tpu.ops.flash_attention import (metadata_mmu,
                                               metadata_predict_next,
                                               omni_attention,
                                               omni_attention_packed,
                                               seg_from_soi_eoi)
    from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_predict_next

    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("B", 12))
    S = int(args.get("S", 1152))
    H = int(args.get("H", 8))
    D = int(args.get("D", 64))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
               for _ in range(3))
    n_img = S // 2

    # --- the four reference mask families over a [B, S] token layout ---
    def t2i_seq():
        ids = np.full((B, S), 7, np.int64)
        ids[:, :8] = PAD                        # left padding
        ids[:, -n_img - 2] = SOI
        ids[:, -1] = EOI
        return jnp.asarray(ids)

    def mmu_seq():
        ids = np.full((B, S), 7, np.int64)
        ids[:, 0] = MMU
        ids[:, 1] = SOI
        ids[:, 2 + n_img] = EOI
        return jnp.asarray(ids)

    def mixed_seq():                            # two image spans + text
        ids = np.full((B, S), 7, np.int64)
        third = S // 3
        ids[:, 1] = SOI
        ids[:, third - 1] = EOI
        ids[:, third + 1] = SOI
        ids[:, 2 * third - 1] = EOI
        return jnp.asarray(ids)

    cases = {}
    ids = t2i_seq()
    cases["t2i"] = (metadata_predict_next(ids, PAD, SOI, EOI),
                    omni_mask_predict_next(ids, pad_id=PAD, soi_id=SOI,
                                           eoi_id=EOI,
                                           rm_pad_in_image=True,
                                           dtype=jnp.bfloat16))
    zb = jnp.zeros((B, S), jnp.int32)
    zr = jnp.zeros((B,), jnp.int32)
    causal_bias = jnp.broadcast_to(
        jnp.where(jnp.tril(jnp.ones((S, S), bool)), 0.0, -1e9
                  ).astype(jnp.bfloat16)[None, None], (B, 1, S, S))
    cases["lm"] = ((zb, zb, zr - 1, zr), causal_bias)
    ids = mmu_seq()
    cases["mmu"] = (metadata_mmu(ids, EOI),
                    omni_mask_mmu(ids, eoi_id=EOI, dtype=jnp.bfloat16))
    ids = mixed_seq()
    seg = seg_from_soi_eoi(ids, SOI, EOI)
    vis = (jnp.tril(jnp.ones((S, S), bool))[None]
           | ((seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0)))
    cases["mixed"] = ((seg, zb, zr - 1, zr),
                      jnp.where(vis[:, None], 0.0, -1e9
                                ).astype(jnp.bfloat16))

    print(f"B={B} S={S} H={H} D={D} bf16 "
          f"(reference harness shape, values it never recorded)")
    for name, (meta, bias) in cases.items():
        seg, pad, last_pad, prefix = meta
        fk = (lambda q, k, v, seg=seg, pad=pad, lp=last_pad,
              pf=prefix: omni_attention(q, k, v, seg, pad, lp, pf))

        def pk(q, k, v, seg=seg, pad=pad, lp=last_pad, pf=prefix):
            # packed layout: [B, S, H*D] (post-projection, no transpose)
            to = lambda x: jnp.swapaxes(x, 1, 2).reshape(B, S, H * D)
            out = omni_attention_packed(to(q), to(k), to(v), seg, pad, lp,
                                        pf, num_heads=H)
            return out.reshape(B, S, H, D).swapaxes(1, 2)

        def dense(q, k, v, bias=bias):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) / np.sqrt(D)
            s = s + bias.astype(jnp.float32)
            p = jax.nn.softmax(s, -1).astype(v.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        ms_f = bench(fk, q, k, v)
        ms_p = bench(pk, q, k, v)
        ms_d = bench(dense, q, k, v)
        err = float(jnp.max(jnp.abs(
            jax.jit(fk)(q, k, v).astype(jnp.float32)
            - jax.jit(dense)(q, k, v).astype(jnp.float32))))
        print(f"{name:6s} pallas {ms_f:7.2f} ms   packed {ms_p:7.2f} ms   "
              f"xla-dense {ms_d:7.2f} ms   max|err| {err:.2e}")


if __name__ == "__main__":
    main()
