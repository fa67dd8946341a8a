"""DiT head ablation: why is the 10-block ModulatedAttention stack at
~4x its matmul floor (38.1 ms vs ~9 ms, probe_v2_breakdown.py)?

Times dit_forward variants on the real chip at the v2 t2i shape
(B=2 CFG, S=986, hidden 2048) to isolate the overhead:
  full        — production path (dense attention)
  packed      — production path with the packed Pallas attention
  nomod       — span_broadcast modulation replaced by scalar constants
                (isolates the 6 per-layer [B,S,D] gather broadcasts)
  noattn      — attention replaced by identity (isolates score traffic)
  floor       — the 4 matmuls per layer alone in the same scan

Run:  python tools/probe_dit_breakdown.py [unroll=10]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _sync(out):
    import numpy as np

    return float(np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))


def bench(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    import dataclasses

    from showo_tpu.show_o2.dit import (DiffusionHeadConfig, dit_forward,
                                       init_dit_params)
    from showo_tpu.show_o2 import dit as ditmod

    unroll = int(args.get("unroll", 10))
    cfg = dataclasses.replace(DiffusionHeadConfig(), scan_unroll=unroll)
    B, S = int(args.get("batch", 2)), int(args.get("seq", 986))
    M = 1
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(cfg, k, jnp.bfloat16))(key)
    params = ditmod.fuse_inference(params)  # production: fused qkv + gu
    h = jax.random.normal(key, (B, S, cfg.hidden_size), jnp.bfloat16)
    adaln = jax.random.normal(key, (B * M, cfg.hidden_size), jnp.bfloat16)
    # one image span covering rows [217, 217+729) like the 432px layout
    mp = jnp.tile(jnp.array([[[217, 729]]], jnp.int32), (B, 1, 1))
    bias = jnp.zeros((B, 1, S, S), jnp.bfloat16)
    seg = jnp.where((jnp.arange(S) >= 217) & (jnp.arange(S) < 946), 1, 0
                    )[None, :].repeat(B, 0).astype(jnp.int32)
    pad = jnp.zeros((B, S), jnp.int32)
    last_pad = jnp.full((B,), S, jnp.int32)
    prefix = jnp.zeros((B,), jnp.int32)

    full = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, bias, mp))
    packed = jax.jit(lambda p, h, a: dit_forward(
        cfg, p, h, a, None, mp,
        attn_meta=("pallas_packed", seg, pad, last_pad, prefix)))

    iters = int(args.get("iters", 20))
    print(f"full (dense bias):  {bench(full, params, h, adaln, iters=iters):7.2f} ms")
    if args.get("packed", "1") != "0":
        print(f"packed attention:   {bench(packed, params, h, adaln, iters=iters):7.2f} ms")

    # --- nomod: neutralize span modulation (scalars fold into elementwise)
    orig_sm = ditmod.span_modulation

    def scalar_sm(ada, modality_positions, L, n_chunks=6, **kw):
        # fail loudly if a future probe exercises the cached-window fast
        # path: these variants don't implement full_span semantics and
        # would silently measure the wrong thing (ADVICE r4)
        assert not kw.get("full_span"), "scalar_sm: full_span unsupported"
        Bm = modality_positions.shape[0]
        D = ada.shape[1] // n_chunks
        z = jnp.zeros((Bm, 1, D), ada.dtype)
        return [z] * n_chunks, jnp.ones((Bm, 1), bool)

    ditmod.span_modulation = scalar_sm
    nomod = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, bias, mp))
    print(f"nomod (scalar mod): {bench(nomod, params, h, adaln, iters=iters):7.2f} ms")
    ditmod.span_modulation = orig_sm

    # --- gather variant: the 6 original span_broadcast row-gathers
    def gather_sm(ada, modality_positions, L, n_chunks=6, **kw):
        assert not kw.get("full_span"), "gather_sm: full_span unsupported"
        chunks = jnp.split(ada, n_chunks, axis=-1)
        outs = [ditmod.span_broadcast(c, modality_positions, L, 0.0)
                for c in chunks]
        pos = jnp.arange(L)[None, :, None]
        off = modality_positions[:, None, :, 0]
        ln = modality_positions[:, None, :, 1]
        claimed = jnp.any((pos >= off) & (pos < off + ln), axis=-1)
        return outs, claimed

    ditmod.span_modulation = gather_sm
    gat = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, bias, mp))
    print(f"gather modulation:  {bench(gat, params, h, adaln, iters=iters):7.2f} ms")
    ditmod.span_modulation = orig_sm

    # --- broadcast variant (M == 1): where(in_span, ada[b], 0) — a pure
    # broadcast+select that XLA fuses into the modulate consumers, vs the
    # einsum's materialized [B, L, 6D] dot output
    def broadcast_sm(ada, modality_positions, L, n_chunks=6, **kw):
        assert not kw.get("full_span"), "broadcast_sm: full_span unsupported"
        Bm, DN = ada.shape
        B = modality_positions.shape[0]
        pos = jnp.arange(L)
        off = modality_positions[:, 0, 0]
        ln = modality_positions[:, 0, 1]
        claimed = ((pos[None, :] >= off[:, None])
                   & (pos[None, :] < (off + ln)[:, None]))   # [B, L]
        mod = jnp.where(claimed[:, :, None], ada.reshape(B, 1, DN), 0)
        return jnp.split(mod, n_chunks, axis=-1), claimed

    ditmod.span_modulation = broadcast_sm
    bsel_d = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, bias, mp))
    bsel_p = jax.jit(lambda p, h, a: dit_forward(
        cfg, p, h, a, None, mp,
        attn_meta=("pallas_packed", seg, pad, last_pad, prefix)))
    print(f"bcast mod (dense):  {bench(bsel_d, params, h, adaln, iters=iters):7.2f} ms")
    print(f"bcast mod (packed): {bench(bsel_p, params, h, adaln, iters=iters):7.2f} ms")
    ditmod.span_modulation = orig_sm

    # --- floor: the 4 matmuls per layer in the same scan structure
    def floor_fn(p, h):
        def body(x, lp):
            y = x @ lp["qkv"]["kernel"] if "qkv" in lp else (
                x @ jnp.concatenate([lp["q"]["kernel"], lp["k"]["kernel"],
                                     lp["v"]["kernel"]], axis=-1))
            x = y[..., :cfg.hidden_size] @ lp["o"]["kernel"]
            if "gu" in lp:
                gu = x @ lp["gu"]["kernel"]
                x = (gu[..., :cfg.intermediate_size]
                     * gu[..., cfg.intermediate_size:]) @ lp["down"]["kernel"]
            else:
                x = ((x @ lp["gate"]["kernel"]) * (x @ lp["up"]["kernel"])
                     ) @ lp["down"]["kernel"]
            return x, None

        out, _ = jax.lax.scan(body, h, p["layers"], unroll=cfg.scan_unroll)
        return out

    floor = jax.jit(floor_fn)
    print(f"matmul floor:       {bench(floor, params, h, iters=iters):7.2f} ms")


if __name__ == "__main__":
    main()
