"""v1 fused train-step decomposition: where do the 1.21 s/step go?

Times the pieces of the fused step (bench.py metric=train recipe shape,
B = 15 t2i + 4 lm + 10 mmu, S=388) in isolation on the real chip:
  vq        — frozen MAGVIT encode of the 25 images
  fwd       — 3-loss forward only (no grad)
  grad      — value_and_grad of the losses (remat as given)
  step      — the full fused step (grad + AdamW update)
Implied: bwd = grad - fwd, optimizer = step - grad - vq(approx).

Run: python tools/probe_train_breakdown.py [remat=full] [attn_impl=dense]
     [batch_scale=1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    return float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())


def bench(fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                        showo_losses)
    from showo_tpu.sampling.schedules import cosine_schedule
    from showo_tpu.training.train_showo import make_fused_train_step
    from showo_tpu.training.train_step import (TrainConfig, TrainState,
                                               make_optimizer)

    scale = int(args.get("batch_scale", 1))
    b_t2i, b_lm, b_mmu = 15 * scale, 4 * scale, 10 * scale
    res = 256
    cfg = ShowoConfig()
    vq_cfg = VQConfig()
    tc = TrainConfig(max_seq_length=128,
                     attn_impl=args.get("attn_impl", "dense"),
                     remat=args.get("remat", "full"))
    sp = {"<|pad|>": 50295, "<|soi|>": 50296, "<|eoi|>": 50297,
          "<|mmu|>": 50300}
    opt = make_optimizer(tc)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_showo_params(cfg, k, dtype=jnp.bfloat16))(key)
    vq = MagvitV2(vq_cfg)
    vq_params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        vq.init(k, jnp.zeros((1, res, res, 3)))["params"]))(jax.random.PRNGKey(1))
    jax.block_until_ready((params, vq_params))

    L_text = tc.max_seq_length + 1
    lm_L = L_text + cfg.num_vq_tokens + 2
    rng = np.random.default_rng(0)
    t2i_pixels = jnp.asarray(rng.normal(size=(b_t2i, res, res, 3)), jnp.float32)
    t2i_text = jnp.asarray(rng.integers(2, 50000, size=(b_t2i, L_text)))
    lm_ids = jnp.asarray(rng.integers(2, 50000, size=(b_lm, lm_L)))
    lm_labels = jnp.where(lm_ids > 100, lm_ids, -100)
    mmu_pixels = jnp.asarray(rng.normal(size=(b_mmu, res, res, 3)), jnp.float32)
    mmu_text = jnp.asarray(rng.integers(2, 50000, size=(b_mmu, L_text - 1)))
    mmu_labels = jnp.where(mmu_text > 100, mmu_text, -100)
    iters = int(args.get("iters", 5))

    # --- vq encode alone
    @jax.jit
    def vq_fn(vp, px):
        return vq.apply({"params": vp}, px.astype(jnp.bfloat16),
                        method=vq.get_code)

    ms_vq = (bench(vq_fn, vq_params, t2i_pixels, iters=iters)
             + bench(vq_fn, vq_params, mmu_pixels, iters=iters))
    print(f"vq encode (25 img):  {ms_vq:8.1f} ms")

    # --- assemble ids/labels/bias once via the step internals: reuse the
    # fused step but time fwd/grad on fixed token inputs (approximate the
    # in-step assembly as part of "step - grad - vq")
    lm_LL = lm_L
    n_rows = b_t2i + b_lm + b_mmu
    ids = jnp.asarray(rng.integers(2, 50000, size=(n_rows, lm_LL)))
    labels = jnp.where(ids > 100, ids, -100)
    from showo_tpu.ops.flash_attention import (metadata_mmu,
                                               metadata_predict_next,
                                               seg_from_soi_eoi)

    soi, eoi, pad = sp["<|soi|>"], sp["<|eoi|>"], sp["<|pad|>"]
    seg_t, pad_t, lp_t, pf_t = metadata_predict_next(
        ids[:b_t2i], pad, soi, eoi)
    seg_l = seg_from_soi_eoi(ids[b_t2i:b_t2i + b_lm], soi, eoi)
    pad_l = jnp.zeros_like(seg_l)
    lp_l = jnp.full((b_lm,), -1, jnp.int32)
    pf_l = jnp.zeros((b_lm,), jnp.int32)
    seg_m, pad_m, lp_m, pf_m = metadata_mmu(ids[b_t2i + b_lm:], eoi)
    attn_meta = (tc.attn_impl,
                 jnp.concatenate([seg_t, seg_l, seg_m], axis=0),
                 jnp.concatenate([pad_t, pad_l, pad_m], axis=0),
                 jnp.concatenate([lp_t, lp_l, lp_m], axis=0),
                 jnp.concatenate([pf_t, pf_l, pf_m], axis=0))
    bias = None
    if tc.attn_impl == "dense":
        attn_meta = None
        bias = jnp.zeros((n_rows, 1, lm_LL, lm_LL), jnp.bfloat16)

    def loss_fn(p):
        _, l_t2i, l_lm, l_mmu = showo_losses(
            cfg, p, ids, labels, bias, b_t2i, b_lm, b_mmu,
            max_seq_length=tc.max_seq_length, attn_meta=attn_meta,
            remat=tc.remat)
        return l_t2i + 0.1 * l_lm + l_mmu, (l_t2i, l_lm, l_mmu)

    fwd = jax.jit(lambda p: loss_fn(p)[0])
    ms_fwd = bench(fwd, params, iters=iters)
    print(f"loss fwd only:       {ms_fwd:8.1f} ms")

    if args.get("ablate", "0") != "0":
        from showo_tpu.models.showo import showo_forward

        # forward minus the CE read/softmax (logits still computed)
        sumfwd = jax.jit(lambda p: showo_forward(
            cfg, p, input_ids=ids, attention_bias=bias,
            attn_meta=attn_meta)[0].astype(jnp.float32).sum())
        ms_sum = bench(sumfwd, params, iters=iters)
        print(f"fwd, sum(logits):    {ms_sum:8.1f} ms   (CE cost = "
              f"{ms_fwd - ms_sum:.1f})")

        # forward with a 128-col lm_head (vocab matmul + CE removed)
        import copy
        p_small = dict(params,
                       showo=dict(params["showo"],
                                  lm_head={"kernel": params["showo"][
                                      "lm_head"]["kernel"][:, :128],
                                      "bias": params["showo"][
                                      "lm_head"]["bias"][:128]}))
        smallfwd = jax.jit(lambda p: showo_forward(
            cfg, p, input_ids=ids, attention_bias=bias,
            attn_meta=attn_meta)[0].astype(jnp.float32).sum())
        ms_small = bench(smallfwd, p_small, iters=iters)
        print(f"fwd, 128-col head:   {ms_small:8.1f} ms   (vocab matmul = "
              f"{ms_sum - ms_small:.1f})")
        del p_small   # ~2.6 GB device copy — freed before the grad probe

        # achievable matmul rate at the train forward's own shapes:
        # per layer x @ [D,3D] + a @ [D,D] + x @ [D,F] + m @ [F,D]
        D, F = cfg.llm.hidden_size, cfg.llm.intermediate_size
        rows = ids.shape[0] * ids.shape[1]
        rng2 = jax.random.PRNGKey(9)
        x0 = jax.random.normal(rng2, (rows, D), jnp.bfloat16)
        w1 = jax.random.normal(rng2, (24, D, 3 * D), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(rng2, (24, D, D), jnp.bfloat16) * 0.02
        w3 = jax.random.normal(rng2, (24, D, F), jnp.bfloat16) * 0.02
        w4 = jax.random.normal(rng2, (24, F, D), jnp.bfloat16) * 0.02

        @jax.jit
        def floor_fn(x, w1, w2, w3, w4):
            def body(x, ws):
                a, b, c, d = ws
                y = x @ a
                x = (y[:, :D] @ b + (x @ c) @ d)
                return x, None
            x, _ = jax.lax.scan(body, x, (w1, w2, w3, w4))
            return x.sum()

        ms_floor = bench(floor_fn, x0, w1, w2, w3, w4, iters=iters)
        fl = rows * 24 * 2 * (D * 3 * D + D * D + 2 * D * F) / 1e12
        print(f"matmul floor (fwd):  {ms_floor:8.1f} ms   "
              f"({fl / ms_floor * 1e3:.0f} TFLOP/s at the train shapes)")

    grad = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_fn(q)[0])(p)[1])
    try:
        ms_grad = bench(grad, params, iters=iters)
        print(f"value_and_grad:      {ms_grad:8.1f} ms   (bwd+remat = "
              f"{ms_grad - ms_fwd:.1f})")
    except Exception as e:  # noqa: BLE001
        print(f"value_and_grad:      FAIL {str(e).splitlines()[0][:90]}")
        ms_grad = None

    step_fn = jax.jit(make_fused_train_step(
        cfg, vq_cfg, tc, opt, sp, b_t2i, b_lm, b_mmu, cosine_schedule),
        donate_argnums=(0,))

    def run(state, key):
        return step_fn(state, vq_params, t2i_pixels, t2i_text, lm_ids,
                       lm_labels, mmu_pixels, mmu_text, mmu_labels, key)

    # optimizer state only now — bf16 AdamW moments are 5.2 GB and must
    # not sit live during the grad probes above
    state = TrainState(params, jax.jit(opt.init)(params),
                       jnp.zeros((), jnp.int32))
    state2, m = run(state, jax.random.PRNGKey(2))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state2, m = run(state2, jax.random.PRNGKey(3 + i))
    float(m["loss"])
    ms_step = (time.perf_counter() - t0) / iters * 1e3
    print(f"full fused step:     {ms_step:8.1f} ms   "
          f"({(b_t2i + b_lm + b_mmu) / ms_step * 1e3:.2f} samples/s)")
    if ms_grad is not None:
        print(f"residual (assembly+opt+CE-extra): "
              f"{ms_step - ms_grad - ms_vq:8.1f} ms")


if __name__ == "__main__":
    main()
