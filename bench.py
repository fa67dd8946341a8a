"""Benchmark suite for the showo_tpu framework (one chip).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline north star: 150 images/min/chip at 256^2/16-step (BASELINE.md).

Default (no args) runs the FULL surface — v1 t2i 256+512, mmu decode
bf16+int8, serving v1+v2 (speculative), v2 t2i euler+dpm, t2v, both
train steps — and emits one JSON line whose headline value is the v1
t2i 256^2 number with every sub-metric under "metrics" (so regressions
in non-headline paths stay driver-visible; VERDICT r3 item 4).

Single metrics:  python bench.py metric=t2i [batch=2] [timesteps=16]
                     [mode=cached|plain] [attn=auto|dense|pallas_packed]
                     [vq_tokens=256|1024]  (1024 = the 512px config)
                 python bench.py metric=mmu|mmu_v2 [int8=1]  (decode tok/s)
                 python bench.py metric=serve|serve_v2 [spec=2] [int8=1]
                 python bench.py metric=t2i_v2 [sampler=dpm steps=20]
                 python bench.py metric=t2v | vq
                 python bench.py metric=train [remat=qkv] [opt=adafactor]
                 python bench.py metric=train_v2 [opt=adafactor]
"""

import json
import os
import sys
import time

# persistent compile cache: suite rows recompile mostly-identical
# programs across processes/rounds; also lets the per-row
# jax.clear_caches() below stay cheap (re-runs hit the disk cache)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".cache", "jax_tpu_compile"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp


def bench_mmu(args) -> dict:
    """AR decode tok/s with KV cache on the flagship model."""
    import numpy as np

    from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                        showo_mmu_generate)
    from showo_tpu.ops.masks import omni_mask_mmu

    cfg = ShowoConfig()
    # full unroll: 210 tok/s vs 202 at unroll=1 (partial unroll is
    # pathological: 77 at unroll=8 — don't)
    unroll = int(args.get("unroll", 24))
    if unroll > 1:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=unroll))
    params = jax.jit(lambda k: init_showo_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.get("fused_mlp", "1") != "0":
        from showo_tpu.models.phi import fuse_parallel_mlp

        params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    if args.get("int8", "0") != "0":
        # weight-only int8 serving mode: halves decode weight traffic
        from showo_tpu.models.phi import quantize_int8

        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))
    B = int(args.get("batch", 1))
    max_new = int(args.get("max_new_tokens", 128))
    SOI, EOI, MMU = 50296, 50297, 50300
    rng = jax.random.PRNGKey(1)
    img = jax.random.randint(rng, (B, 256), 50305, 58497)
    q = jax.random.randint(rng, (B, 32), 2, 50000)
    prompt = jnp.concatenate([jnp.full((B, 1), MMU), jnp.full((B, 1), SOI),
                              img, jnp.full((B, 1), EOI), q], axis=1
                             ).astype(jnp.int32)
    bias = omni_mask_mmu(prompt, eoi_id=EOI, dtype=jnp.bfloat16)

    @jax.jit
    def gen(params, prompt, bias, key):
        toks, _ = showo_mmu_generate(cfg, params, prompt, key,
                                     prompt_bias=bias,
                                     max_new_tokens=max_new, top_k=1)
        return toks

    np.asarray(gen(params, prompt, bias, jax.random.PRNGKey(2)))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = gen(params, prompt, bias, jax.random.PRNGKey(3 + i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    tok_s = B * max_new / dt
    return {"metric": "mmu_decode_tok_per_s_kv_cache",
            "value": round(tok_s, 2), "unit": "tok/s",
            "vs_baseline": None}


def bench_mmu_v2(args) -> dict:
    """Show-o2 1.5B AR decode tok/s with KV cache (VERDICT r2 item 2:
    the v2 analog of metric=mmu).  Random image latents through the
    dual-path embedder, qwen chat scaffold, jitted prefill + decode scan."""
    import numpy as np

    from showo_tpu.sampling.ar import ar_generate
    from showo_tpu.show_o2.dit import time_embed_apply
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward
    from showo_tpu.show_o2.showo2 import (Showo2Config, embed_images,
                                          fuse_inference,
                                          init_showo2_params)

    B = int(args.get("batch", 1))
    max_new = int(args.get("max_new_tokens", 128))
    cfg = Showo2Config()
    unroll = int(args.get("unroll", 28))
    if unroll > 1:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=unroll))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.get("fused", "1") != "0":
        params = fuse_inference(params)
    if args.get("int8", "0") != "0":
        from showo_tpu.show_o2.qwen2 import quantize_int8

        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))

    n_img = cfg.num_image_tokens
    latents = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, cfg.image_latent_dim, cfg.image_latent_height,
         cfg.image_latent_width), jnp.bfloat16)
    pre = jax.random.randint(jax.random.PRNGKey(2), (B, 24), 10, 150000)
    post = jax.random.randint(jax.random.PRNGKey(3), (B, 12), 10, 150000)
    llm = cfg.llm

    @jax.jit
    def gen(params, latents, pre, post, key):
        image_embeds = embed_images(cfg, params, latents)
        embed = params["showo"]["embed"]
        emb_a, emb_b = embed[pre], embed[post]
        t1 = jnp.ones((B,), jnp.float32)
        te = time_embed_apply(params["time_embed"], t1, emb_a.dtype)
        if "time_embed_proj" in params:
            tp = params["time_embed_proj"]
            te = te @ tp["kernel"] + tp["bias"]
        input_embeds = jnp.concatenate(
            [emb_a, te[:, None, :], image_embeds, emb_b], axis=1)
        S = input_embeds.shape[1]
        mp = jnp.broadcast_to(
            jnp.asarray([[pre.shape[1], n_img]], jnp.int32)[None],
            (B, 1, 2))
        bias = omni_attn_mask(mp.reshape(B, 1, 2), S)
        cap = S + max_new

        def prefill(_ids, pb):
            cache = Qwen2KVCache.zeros(llm, B, cap, dtype=embed.dtype)
            pad = cap - pb.shape[-1]
            pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 0), (0, pad)),
                         constant_values=-1e9)
            logits, _, cache = qwen2_forward(
                llm, params["showo"], input_embeds=input_embeds,
                attention_bias=pb, cache=cache)
            return logits, cache

        def decode(tok_ids, b, cache):
            logits, _, cache = qwen2_forward(
                llm, params["showo"], input_embeds=embed[tok_ids],
                attention_bias=b, cache=cache)
            return logits, cache

        toks, _ = ar_generate(prefill, decode,
                              jnp.zeros((B, S), jnp.int32), key,
                              max_new_tokens=max_new, top_k=1,
                              prompt_bias=bias)
        return toks

    np.asarray(gen(params, latents, pre, post, jax.random.PRNGKey(4)))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = gen(params, latents, pre, post, jax.random.PRNGKey(5 + i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": "showo2_mmu_decode_tok_per_s_kv_cache",
            "value": round(B * max_new / dt, 2), "unit": "tok/s",
            "vs_baseline": None}


def bench_vq(args) -> dict:
    """MAGVIT-v2 VQ encode (or mode=decode) megapixels/s."""
    import numpy as np

    from showo_tpu.models.magvit import MagvitV2, VQConfig

    res = int(args.get("resolution", 256))
    B = int(args.get("batch", 16))
    mode = args.get("mode", "encode")
    vq = MagvitV2(VQConfig())
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    if mode == "decode":
        n = (res // 16) ** 2
        codes = jax.random.randint(jax.random.PRNGKey(1), (B, n), 0, 8192)

        @jax.jit
        def fn(params, x):
            return vq.apply({"params": params}, x, method=vq.decode_code)

        arg = codes
    else:
        arg = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, 3),
                                jnp.bfloat16)

        @jax.jit
        def fn(params, x):
            return vq.apply({"params": params}, x, method=vq.get_code)

    np.asarray(fn(params, arg)).ravel()[:1]
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, arg)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    mpix_s = B * res * res / dt / 1e6
    return {"metric": f"vq_{mode}_mpix_per_s_{res}px",
            "value": round(mpix_s, 2), "unit": "Mpix/s",
            "vs_baseline": None}


def bench_t2i_v2(args) -> dict:
    """Show-o2 1.5B flow-matching T2I throughput (euler + CFG)."""
    import numpy as np

    from showo_tpu.pipelines.t2i_v2 import T2IV2Pipeline
    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    B = int(args.get("batch", 1))
    steps = int(args.get("steps", 50))
    cfg = Showo2Config()
    unroll = int(args.get("unroll", 28))  # full unroll: 21.9 vs 21.5 img/min
    if unroll > 1:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=unroll),
            dit=dataclasses.replace(cfg.dit, scan_unroll=min(unroll, 10)))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(lambda k: init_wan_vae_params(vae_cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(1))

    class Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7] * 16}

    ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
               img_pad_id=6)
    pipe = T2IV2Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                         vae_params=vae_params, tokenizer=Tok(),
                         token_ids=ids, guidance_scale=7.5, num_steps=steps,
                         max_text_len=256,
                         sampling_method=args.get("sampler", "euler"),
                         prefix_cache=args.get("prefix_cache", "0") != "0",
                         fuse_weights=args.get("fused", "1") != "0")
    prompts = ["a"] * B
    np.asarray(pipe.generate(prompts, jax.random.PRNGKey(2))[:, :2, :2])
    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipe.generate(prompts, jax.random.PRNGKey(3 + i))
    np.asarray(out[:, :2, :2])
    dt = (time.perf_counter() - t0) / iters
    tag = "" if args.get("sampler", "euler") == "euler" \
        else f"_{args['sampler']}"
    return {
        "metric": f"showo2_t2i_images_per_min_per_chip_432px_{steps}steps{tag}",
        "value": round(B * 60.0 / dt, 2), "unit": "images/min/chip",
        "vs_baseline": None}


def bench_t2v(args) -> dict:
    """Show-o2 1.5B text-to-video throughput (joint video latents)."""
    import numpy as np

    from showo_tpu.pipelines.t2v import T2VPipeline
    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    B = int(args.get("batch", 1))
    steps = int(args.get("steps", 20))
    frames = int(args.get("latent_frames", 2))  # -> 4*(T-1)+1 pixel frames
    cfg = Showo2Config()
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(lambda k: init_wan_vae_params(vae_cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(1))

    class Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7] * 16}

    ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
               img_pad_id=6, vid_pad_id=7)
    pipe = T2VPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                       vae_params=vae_params, tokenizer=Tok(), token_ids=ids,
                       num_latent_frames=frames, guidance_scale=5.0,
                       num_steps=steps, max_text_len=256,
                       attn_impl=args.get("attn_impl", "auto"))
    prompts = ["a"] * B
    out = pipe.generate(prompts, jax.random.PRNGKey(2))
    np.asarray(out[:, :1, :2, :2])
    pix_frames = out.shape[1]
    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipe.generate(prompts, jax.random.PRNGKey(3 + i))
    np.asarray(out[:, :1, :2, :2])
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": f"showo2_t2v_frames_per_min_per_chip_432px_{steps}steps",
        "value": round(B * pix_frames * 60.0 / dt, 2),
        "unit": "frames/min/chip", "vs_baseline": None}


def bench_train(args) -> dict:
    """v1 fused train-step throughput (samples/sec/chip) at the reference
    per-GPU stage-1 recipe batch 15 t2i + 4 lm + 10 mmu
    (configs/showo_pretraining_stage1.yaml:83-103; the reference logs the
    same samples/sec metric, train.py:637-650, but publishes no values).
    Frozen full-size MAGVIT VQ encode + corruption + assembly + 3-loss
    fwd/bwd + AdamW, one jitted program; bf16 params/moments."""
    import numpy as np

    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.models.showo import ShowoConfig, init_showo_params
    from showo_tpu.sampling.schedules import cosine_schedule
    from showo_tpu.training.train_showo import make_fused_train_step
    from showo_tpu.training.train_step import (TrainConfig, TrainState,
                                               make_optimizer)

    b_t2i = int(args.get("batch_t2i", 15))
    b_lm = int(args.get("batch_lm", 4))
    b_mmu = int(args.get("batch_mmu", 10))
    res = int(args.get("resolution", 256))

    cfg = ShowoConfig()
    if args.get("softmax", "fp32") == "bf16":
        # throughput mode: bf16 attention softmax halves the [B,H,S,S]
        # score traffic (the parity default stays fp32 — the reference
        # upcasts QK scores even under bf16 autocast, models/phi.py)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, llm=_dc.replace(cfg.llm, attn_fp32=False))
    if "unroll" in args:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, llm=_dc.replace(
            cfg.llm, scan_unroll=int(args["unroll"])))
    vq_cfg = VQConfig()
    tc = TrainConfig(max_seq_length=128,
                     attn_impl=args.get("attn_impl", "dense"),
                     remat=args.get("remat", "full"),
                     optimizer=args.get("opt", "adamw"))
    sp = {"<|pad|>": 50295, "<|soi|>": 50296, "<|eoi|>": 50297,
          "<|mmu|>": 50300}
    opt = make_optimizer(tc)

    params = jax.jit(lambda k: init_showo_params(
        cfg, k, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    state = TrainState(params, jax.jit(opt.init)(params),
                       jnp.zeros((), jnp.int32))
    from showo_tpu.models.magvit import MagvitV2 as _M

    vq = _M(vq_cfg)
    vq_params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        vq.init(k, jnp.zeros((1, res, res, 3)))["params"]))(
            jax.random.PRNGKey(1))
    jax.block_until_ready((state.params, vq_params))

    L_text = tc.max_seq_length + 1
    lm_L = L_text + cfg.num_vq_tokens + 2
    rng = np.random.default_rng(0)
    t2i_pixels = jnp.asarray(rng.normal(size=(b_t2i, res, res, 3)),
                             jnp.float32)
    t2i_text = jnp.asarray(rng.integers(2, 50000, size=(b_t2i, L_text)))
    lm_ids = jnp.asarray(rng.integers(2, 50000, size=(b_lm, lm_L)))
    lm_labels = jnp.where(lm_ids > 100, lm_ids, -100)
    mmu_pixels = jnp.asarray(rng.normal(size=(b_mmu, res, res, 3)),
                             jnp.float32)
    mmu_text = jnp.asarray(rng.integers(2, 50000, size=(b_mmu, L_text - 1)))
    mmu_labels = jnp.where(mmu_text > 100, mmu_text, -100)

    step_fn = jax.jit(make_fused_train_step(
        cfg, vq_cfg, tc, opt, sp, b_t2i, b_lm, b_mmu, cosine_schedule),
        donate_argnums=(0,))

    def run(state, key):
        return step_fn(state, vq_params, t2i_pixels, t2i_text, lm_ids,
                       lm_labels, mmu_pixels, mmu_text, mmu_labels, key)

    state, m = run(state, jax.random.PRNGKey(2))
    float(m["loss"])  # scalar fetch: block_until_ready does not force a
    # real device sync over the axon tunnel
    iters = int(args.get("iters", 10))
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = run(state, jax.random.PRNGKey(3 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    n = b_t2i + b_lm + b_mmu
    # %-of-ceiling: fwd+bwd matmul FLOPs ~= 6 x matmul-params x tokens
    # (VERDICT r2 item 4: publish the floor ratio like decode has one);
    # ceiling = 277 TFLOP/s sustained bf16 (tools/probe_int8_matmul.py)
    D, F, Lyr = (cfg.llm.hidden_size, cfg.llm.intermediate_size,
                 cfg.llm.num_layers)
    matmul_params = Lyr * (4 * D * D + 2 * D * F) + D * cfg.vocab_size
    S_tok = L_text + cfg.num_vq_tokens + 2
    tokens = n * S_tok
    tflops_step = 6 * matmul_params * tokens / 1e12
    pct = tflops_step / dt / 277.0 * 100
    return {
        "metric": f"train_samples_per_sec_per_chip_{res}px",
        "value": round(n / dt, 2), "unit": "samples/s/chip",
        "vs_baseline": None,
        "model_tflops_per_s": round(tflops_step / dt, 1),
        "pct_of_277tflops_ceiling": round(pct, 1),
        "attn_impl": tc.attn_impl, "remat": tc.remat,
        "optimizer": tc.optimizer,
        "softmax": args.get("softmax", "fp32")}


def bench_train_v2(args) -> dict:
    """Show-o2 1.5B stage-1 fused train step on ONE chip (samples/s/chip).

    bf16-AdamW state alone is 14.4 GB for the 2.4B-param model, so the
    single-chip config uses Adafactor (factored second moment, ~zero
    optimizer state) + full-layer remat — the reference has no 1-chip
    story at all (8x80 GB GPUs, show-o2/train_stage_one.py).  Frozen
    Wan-VAE encode + NTP+flow fwd/bwd + update, one jitted program.

    knobs: batch= (default 1 — batch 2 needs ~16.5 GB, just over the
    16 GB chip), seq= (default 1024), opt= (adafactor | adamw |
    adamw_bf16), res= (432)."""
    import numpy as np

    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.train_stage_one import (Stage1Config,
                                                   make_stage1_optimizer,
                                                   make_stage1_step)
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    B = int(args.get("batch", 1))
    L = int(args.get("seq", 1024))
    res = int(args.get("res", 432))
    opt_name = args.get("opt", "adafactor")

    cfg = Showo2Config()
    if args.get("softmax", "fp32") == "bf16":
        # throughput mode: bf16 scores halve dense [B,H,S,S] traffic in
        # BOTH towers (parity default fp32 — the reference upcasts)
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, llm=_dc.replace(cfg.llm, attn_fp32=False),
            dit=_dc.replace(cfg.dit, attn_fp32=False))
    vae_cfg = WanVAEConfig()
    sc = Stage1Config(optimizer=opt_name,
                      attn_impl=args.get("attn_impl", "dense"),
                      remat=args.get("remat", "full"))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_params = jax.jit(lambda k: init_wan_vae_params(
        vae_cfg, k, jnp.bfloat16))(jax.random.PRNGKey(1))
    opt = make_stage1_optimizer(sc, params)
    opt_state = jax.jit(opt.init)(params)
    transport = Transport(snr_type="lognorm", do_shift=True,
                          seq_len=cfg.num_image_tokens)
    step = jax.jit(make_stage1_step(cfg, vae_cfg, sc, transport, opt),
                   donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    off = L - n_img - 2
    batch = {
        "text_tokens": jnp.asarray(
            rng.integers(2, 150000, size=(B, L)), jnp.int32),
        "text_labels": jnp.asarray(
            rng.integers(2, 150000, size=(B, L)), jnp.int32),
        "modality_positions": jnp.tile(
            jnp.array([[[off, n_img]]], jnp.int32), (B, 1, 1)),
        "text_masks": jnp.ones((B, L), jnp.int32),
        "image_masks": (jnp.arange(L)[None] >= off).astype(jnp.int32)
        * (jnp.arange(L)[None] < off + n_img).astype(jnp.int32)
        * jnp.ones((B, 1), jnp.int32),
        "images": jnp.asarray(rng.normal(size=(B, res, res, 3)),
                              jnp.float32),
        "is_und": jnp.zeros((B,), jnp.int32),
    }
    params, opt_state, m = step(params, opt_state, vae_params, batch,
                                jax.random.PRNGKey(2))
    float(m["loss"])
    iters = int(args.get("iters", 5))
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, vae_params, batch,
                                    jax.random.PRNGKey(3 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    # fwd+bwd+remat-fwd = 8x matmul-params x tokens (full-layer remat)
    qc, dc = cfg.llm, cfg.dit
    D, F, Lyr = qc.hidden_size, qc.intermediate_size, qc.num_layers
    Hd = qc.num_heads * qc.head_dim
    Kvd = qc.num_kv_heads * qc.head_dim
    qwen_p = Lyr * (D * Hd + 2 * D * Kvd + Hd * D + 3 * D * F) \
        + D * qc.vocab_size
    dD, dF = dc.hidden_size, dc.intermediate_size
    dHd, dKvd = dc.num_heads * dc.head_dim, dc.num_kv_heads * dc.head_dim
    dit_p = dc.num_layers * (dD * dHd + 2 * dD * dKvd + dHd * dD
                             + 3 * dD * dF + 7 * dD * dD)
    # the und tower + embedders + fusion are part of the trained model's
    # forward (showo2.embed_images), not preprocessing — count them
    # (they backprop through even when siglip params are frozen).  729
    # patch tokens per image; fusion/diff_proj apply per sequence row.
    sg = cfg.siglip
    sD, sF = sg.hidden_size, sg.intermediate_size
    siglip_p = sg.num_layers * (4 * sD * sD + 2 * sD * sF)
    n_patch = (cfg.image_latent_height // cfg.patch_size) ** 2
    pc = cfg.patch_size ** 2 * cfg.image_latent_dim
    embed_p = pc * (cfg.clip_latent_dim + D)
    fusion_p = (cfg.clip_latent_dim + D) * D + D * D
    aux_flops = 6 * (siglip_p + embed_p + fusion_p) * B * n_patch
    dd = cfg.dit.hidden_size
    if D != dd:   # diff_proj runs on every sequence row
        aux_flops += 6 * (D * dd + dd * dd) * B * L
    # 6 x matmul-params x tokens = fwd+bwd USEFUL matmul FLOPs (standard
    # MFU accounting, same as metric=train for v1); remat recompute is
    # real hardware work but not counted — lighter remat= policies raise
    # this number by doing less recompute, as they should
    tflops_step = (6 * (qwen_p + dit_p) * B * L + aux_flops) / 1e12
    return {
        "metric": "train_v2_stage1_samples_per_sec_per_chip",
        "value": round(B / dt, 3), "unit": "samples/s/chip",
        "vs_baseline": None,
        "model_tflops_per_s": round(tflops_step / dt, 1),
        "pct_of_277tflops_ceiling": round(tflops_step / dt / 2.77, 1),
        "optimizer": opt_name, "batch": B, "seq": L,
        "remat": args.get("remat", "full"),
        "softmax": args.get("softmax", "fp32")}


def bench_serve(args) -> dict:
    """Continuous-batching MMU serving throughput (showo_tpu/serving).

    A workload of requests with heterogeneous prompt lengths and decode
    budgets runs through the slot engine; the comparison point is the
    static-batch alternative (batches of `slots` requests where every
    lane decodes to the batch's LONGEST budget — the reference's serving
    shape, inference_mmu.py one-batch-at-a-time).  vs_baseline reports
    the speedup over that static schedule measured in the same process.
    """
    import numpy as np

    from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                        showo_mmu_generate)
    from showo_tpu.ops.masks import omni_mask_mmu
    from showo_tpu.serving import ShowoMMUServer

    cfg = ShowoConfig()
    params = jax.jit(lambda k: init_showo_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.get("fused_mlp", "1") != "0":
        from showo_tpu.models.phi import fuse_parallel_mlp

        params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    if args.get("int8", "0") != "0":
        from showo_tpu.models.phi import quantize_int8

        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))
    slots = int(args.get("slots", 8))
    chunk = int(args.get("chunk", 16))
    spec = int(args.get("spec", 0))  # prompt-lookup speculative draft len
    n_req = int(args.get("requests", 32))
    SOI, EOI, MMU = 50296, 50297, 50300
    rng = np.random.default_rng(5)
    reqs = []
    for _ in range(n_req):
        q_len = int(rng.integers(8, 64))
        budget = int(rng.integers(16, 128))
        img = rng.integers(50305, 58497, size=256)
        q = rng.integers(2, 50000, size=q_len)
        prompt = np.concatenate([[MMU, SOI], img, [EOI], q]).astype(np.int32)
        reqs.append((prompt, budget))
    total_tokens = sum(b for _, b in reqs)

    # margin: one window-chunk of steps, (spec+1) tokens each (no EOT)
    cap = -(-(324 + 128 + chunk * (spec + 1) + slots) // 64) * 64
    fused_admit = None  # auto: on for the plain fused-mlp path
    if args.get("fused_admit") is not None:
        fused_admit = args.get("fused_admit") != "0"
    server = ShowoMMUServer(cfg, params, slots=slots, cap=cap, chunk=chunk,
                            buckets=(320, 384, 448),
                            temperature=float(args.get("temperature", 1.0)),
                            top_k=(None if args.get("top_k") == "none"
                                   else int(args.get("top_k", 1))),
                            top_p=(float(args["top_p"])
                                   if "top_p" in args else None),
                            speculative_k=spec,
                            fused_admit=fused_admit,
                            kv_int8=args.get("kv_int8", "0") != "0")
    # warm up every compiled program off the clock: per bucket, the plain
    # prefill (admission from idle) AND the fused-admit step (admission
    # while another lane decodes), plus the decode chunk
    def _wreq(bucket):
        q = rng.integers(2, 50000, size=bucket - 261)
        img = rng.integers(50305, 58497, size=256)
        return np.concatenate([[MMU, SOI], img, [EOI], q]).astype(np.int32)

    for bucket in (320, 384, 448):
        server.submit(_wreq(bucket), 4)
        server.run(jax.random.PRNGKey(0))   # idle start: plain prefill
    if server.engine._fused_admit_for is not None:
        # under adaptive A/B, fused admission is gated on a committed
        # "alt" choice — force it so the warmup compiles the fused
        # programs off the clock (reset_ab below restarts probation)
        server.engine.force_ab("alt")
        server.submit(_wreq(320), 8)        # keeps a lane busy (plain)
        for bucket in (320, 384, 448):
            server.submit(_wreq(bucket), 4)  # admitted busy: fused
        server.run(jax.random.PRNGKey(0))
    server.engine.stat_steps = 0
    # probation restarts for the timed run (warmup windows have
    # mismatched lane counts/budgets and would mis-measure); programs
    # compiled during warmup, so in-run probation pays no compile
    server.engine.reset_ab()
    for p, b in reqs:
        server.submit(p, b)
    t0 = time.perf_counter()
    done = server.run(jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    assert len(done) == n_req
    tok_s = total_tokens / dt

    # static-batch alternative: pad each group of `slots` prompts to one
    # length, decode the whole batch to the group's longest budget
    static_s = 0.0
    pad_len = 324 + 64
    for i in range(0, n_req, slots):
        group = reqs[i:i + slots]
        B = len(group)
        ids = np.full((B, pad_len), 1, np.int32)
        for j, (p, _) in enumerate(group):
            ids[j, pad_len - len(p):] = p  # left-pad, reference style
        budget = max(b for _, b in group)
        ids_j = jnp.asarray(ids)
        bias = omni_mask_mmu(ids_j, eoi_id=EOI, dtype=jnp.bfloat16)

        @jax.jit
        def gen(params, ids, bias, key):
            toks, _ = showo_mmu_generate(cfg, params, ids, key,
                                         prompt_bias=bias,
                                         max_new_tokens=budget, top_k=1)
            return toks

        np.asarray(gen(params, ids_j, bias, jax.random.PRNGKey(2)))  # warm
        t0 = time.perf_counter()
        np.asarray(gen(params, ids_j, bias, jax.random.PRNGKey(3)))
        static_s += time.perf_counter() - t0
    out = {
        "metric": "mmu_serving_tok_per_s_continuous_batching",
        "value": round(tok_s, 2), "unit": "tok/s",
        "vs_baseline": round(static_s / dt, 2),
        "static_batch_tok_per_s": round(total_tokens / static_s, 2),
        "requests": n_req, "slots": slots, "chunk": chunk,
        "fused_admit": bool(server.engine._fused_admit_for is not None)}
    if args.get("top_k") == "none" or "top_p" in args \
            or float(args.get("temperature", 1.0)) != 1.0:
        out["sampling"] = {"temperature": float(args.get("temperature", 1.0)),
                           "top_k": args.get("top_k", "1"),
                           "top_p": args.get("top_p")}
    if spec:
        steps = max(1, server.engine.stat_steps)
        out["speculative_k"] = spec
        out["tokens_per_lane_step"] = round(total_tokens / (steps * slots), 3)
        if server.engine.ab_choice is not None:
            out["spec_ab_choice"] = server.engine.ab_choice
            out["spec_ab_trace"] = getattr(server.engine, "ab_trace",
                                           [])[:6]
    return out


def bench_serve_v2(args) -> dict:
    """Show-o2 continuous-batching MMU serving (Showo2MMUServer).

    Requests are pre-assembled embedding prompts (text + time + image
    span) with heterogeneous question lengths and budgets; reports the
    aggregate decode tok/s across the slot engine.  Compare against
    metric=mmu_v2 batch=1 (one request at a time, the reference's
    serving shape): the engine keeps every lane busy.
    """
    import numpy as np

    from showo_tpu.serving import Showo2MMUServer
    from showo_tpu.show_o2.dit import time_embed_apply
    from showo_tpu.show_o2.showo2 import (Showo2Config, embed_images,
                                          fuse_inference, init_showo2_params)

    cfg = Showo2Config()
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.get("fused", "1") != "0":
        params = fuse_inference(params)
    if args.get("int8", "0") != "0":
        from showo_tpu.show_o2.qwen2 import quantize_int8

        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))
    slots = int(args.get("slots", 4))
    chunk = int(args.get("chunk", 16))
    spec = int(args.get("spec", 0))
    n_req = int(args.get("requests", 12))
    n_img = cfg.num_image_tokens
    buckets = (768, 832)
    cap = 832 + 128 + chunk * (spec + 1)

    @jax.jit
    def build_prompt(params, latents, pre, post):
        image_embeds = embed_images(cfg, params, latents)
        embed = params["showo"]["embed"]
        emb_a, emb_b = embed[pre], embed[post]
        te = time_embed_apply(params["time_embed"], jnp.ones((1,),
                                                             jnp.float32),
                              emb_a.dtype)
        if "time_embed_proj" in params:
            tp = params["time_embed_proj"]
            te = te @ tp["kernel"] + tp["bias"]
        return jnp.concatenate(
            [emb_a, te[:, None, :], image_embeds, emb_b], axis=1)[0]

    rng = np.random.default_rng(7)
    reqs = []
    for i in range(n_req):
        q_len = int(rng.integers(8, 40))
        budget = int(rng.integers(16, 128))
        latents = jax.random.normal(
            jax.random.PRNGKey(10 + i),
            (1, cfg.image_latent_dim, cfg.image_latent_height,
             cfg.image_latent_width), jnp.bfloat16)
        pre = jnp.asarray(rng.integers(10, 150000, size=(1, 24)))
        post = jnp.asarray(rng.integers(10, 150000, size=(1, q_len)))
        emb = np.asarray(build_prompt(params, latents, pre, post))
        # img span starts after pre + time; question ids seed the
        # speculative lookup corpus
        reqs.append((emb, 25, budget, np.asarray(post[0])))
    total_tokens = sum(b for _, _, b, _ in reqs)

    server = Showo2MMUServer(cfg, params, slots=slots, cap=cap, chunk=chunk,
                             buckets=buckets,
                             temperature=float(args.get("temperature", 1.0)),
                             top_k=(None if args.get("top_k") == "none"
                                    else int(args.get("top_k", 1))),
                             top_p=(float(args["top_p"])
                                    if "top_p" in args else None),
                             speculative_k=spec,
                             kv_int8=args.get("kv_int8", "0") != "0")

    def submit(emb, start, budget, ids):
        if spec:
            return server.submit(emb, start, budget, lookup_ids=ids)
        return server.submit(emb, start, budget)

    # warm every bucket + the decode chunk off the clock
    def _wsubmit(b, budget):
        pad = np.zeros((b - 8, cfg.llm.hidden_size), np.float32)
        return submit(pad.astype(reqs[0][0].dtype), 25, budget,
                      np.zeros(4, np.int32))

    for b in buckets:
        _wsubmit(b, 4)
        server.run(jax.random.PRNGKey(0))   # idle start: plain prefill
    if server.engine._fused_admit_for is not None:
        # admission while a lane decodes compiles the fused-admit program
        # (force_ab: see the v1 warmup comment)
        server.engine.force_ab("alt")
        _wsubmit(buckets[0], 8)             # keeps a lane busy
        for b in buckets:
            _wsubmit(b, 4)
        server.run(jax.random.PRNGKey(0))
    server.engine.stat_steps = 0
    # probation restarts for the timed run (warmup windows have
    # mismatched lane counts/budgets and would mis-measure); programs
    # compiled during warmup, so in-run probation pays no compile
    server.engine.reset_ab()
    for emb, start, budget, ids in reqs:
        submit(emb, start, budget, ids)
    t0 = time.perf_counter()
    done = server.run(jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    assert len(done) == n_req
    out = {
        "metric": "showo2_mmu_serving_tok_per_s_continuous_batching",
        "value": round(total_tokens / dt, 2), "unit": "tok/s",
        "vs_baseline": None, "requests": n_req, "slots": slots,
        "chunk": chunk}
    if spec:
        steps = max(1, server.engine.stat_steps)
        out["speculative_k"] = spec
        out["tokens_per_lane_step"] = round(total_tokens / (steps * slots), 3)
        if server.engine.ab_choice is not None:
            out["spec_ab_choice"] = server.engine.ab_choice
            out["spec_ab_trace"] = getattr(server.engine, "ab_trace",
                                           [])[:6]
    return out


def bench_t2i(args) -> dict:
    """v1 T2I throughput (16-step MaskGIT + CFG), the headline metric."""
    batch = int(args.get("batch", 2))
    timesteps = int(args.get("timesteps", 16))
    attn_impl = args.get("attn", "auto")
    mode = args.get("mode", "cached")  # cached = prefix-KV MaskGIT
    vq_tokens = int(args.get("vq_tokens", 256))  # 1024 = the 512px config
    res_px = 256 if vq_tokens == 256 else 512
    if attn_impl == "auto":
        # measured crossover: dense wins at S~387 (256px), the packed
        # Pallas kernel wins at S~1155 (512px)
        attn_impl = "pallas_packed" if vq_tokens >= 1024 else "dense"
    use_pallas = attn_impl if attn_impl.startswith("pallas") else False

    from showo_tpu.models.phi import PhiConfig
    from showo_tpu.models.showo import (
        ShowoConfig, init_showo_params, showo_t2i_generate)
    from showo_tpu.ops.masks import omni_mask_predict_next

    cfg = ShowoConfig(num_vq_tokens=vq_tokens)
    # full layer-loop unroll wins at 256px (276 vs 268 img/min) but loses
    # at 512px (70.8 vs 72.5) where per-layer work is large enough already;
    # partial unroll always regresses (210 at unroll=4)
    unroll = int(args.get("unroll", 24 if vq_tokens < 1024 else 1))
    attn_fp32 = args.get("attn_fp32", "1") != "0"
    if unroll > 1 or not attn_fp32:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=unroll,
                                         attn_fp32=attn_fp32))
    # init under one jit: per-leaf dispatch through the device tunnel is slow
    from showo_tpu.models.phi import fuse_qkv

    params = jax.jit(
        lambda k: init_showo_params(cfg, k, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    if args.get("fused_mlp", "1") != "0":
        from showo_tpu.models.phi import fuse_parallel_mlp

        params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    elif args.get("fused_qkv", "1") != "0":
        params = dict(params, showo=fuse_qkv(params["showo"]))
    jax.block_until_ready(params)

    PAD, SOI, EOI = 50295, 50296, 50297
    rng = jax.random.PRNGKey(1)
    text = jax.random.randint(rng, (batch, 130), 2, 50000)
    img = jnp.full((batch, cfg.num_vq_tokens), cfg.mask_token_id)
    ids = jnp.concatenate(
        [text, jnp.full((batch, 1), SOI), img, jnp.full((batch, 1), EOI)],
        axis=1).astype(jnp.int32)

    # mask construction jitted on device (the reference builds it with host
    # loops, training/prompting_utils.py:493-500)
    @jax.jit
    def build_bias(full_ids):
        return omni_mask_predict_next(full_ids, pad_id=PAD, soi_id=SOI,
                                      eoi_id=EOI, rm_pad_in_image=True,
                                      dtype=jnp.bfloat16)

    bias = build_bias(jnp.concatenate([ids, ids], axis=0))

    # everything is a jit argument: closure constants are serialized into
    # the lowered HLO, which is pathologically slow through a device tunnel
    from showo_tpu.models.showo import showo_t2i_generate_cached

    @jax.jit
    def generate(params, ids, bias, key):
        if mode == "cached":
            return showo_t2i_generate_cached(
                cfg, params, ids, key, uncond_input_ids=ids,
                attention_bias=bias, guidance_scale=1.75,
                timesteps=timesteps, max_seq_length=128,
                use_pallas_attention=use_pallas,
                pad_id=PAD, soi_id=SOI, eoi_id=EOI)
        return showo_t2i_generate(
            cfg, params, ids, key, uncond_input_ids=ids,
            attention_bias=None if use_pallas else bias,
            guidance_scale=1.75, timesteps=timesteps,
            max_seq_length=128, use_pallas_attention=use_pallas,
            pad_id=PAD, soi_id=SOI, eoi_id=EOI)

    import numpy as np

    # warmup/compile; fetch to host to synchronize (block_until_ready is
    # unreliable on tunneled backends)
    np.asarray(generate(params, ids, bias, jax.random.PRNGKey(2)))

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = generate(params, ids, bias, jax.random.PRNGKey(3 + i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n_iters

    imgs_per_min = batch * 60.0 / dt
    return {
        "metric": f"t2i_images_per_min_per_chip_{res_px}px_{timesteps}steps",
        "value": round(imgs_per_min, 2),
        "unit": "images/min/chip",
        "vs_baseline": round(imgs_per_min / 150.0, 3),
    }


BENCHES = {
    "t2i": bench_t2i, "mmu": bench_mmu, "mmu_v2": bench_mmu_v2,
    "vq": bench_vq, "t2i_v2": bench_t2i_v2, "t2v": bench_t2v,
    "train": bench_train, "train_v2": bench_train_v2,
    "serve": bench_serve, "serve_v2": bench_serve_v2,
}

# the full perf surface, best-known config per row (VERDICT r3 item 4:
# one driver-visible JSON block so non-headline regressions surface).
# Rows run in one process; each entry is (name, metric, extra args).
SUITE = [
    ("t2i_256", "t2i", {}),
    ("t2i_512", "t2i", {"vq_tokens": "1024"}),
    ("mmu_bf16", "mmu", {}),
    ("mmu_int8", "mmu", {"int8": "1"}),
    ("mmu_v2_int8", "mmu_v2", {"int8": "1"}),
    ("serve_v1_spec2_int8", "serve", {"spec": "2", "int8": "1"}),
    ("serve_v2_spec2_int8", "serve_v2",
     {"spec": "2", "int8": "1", "slots": "8"}),
    # sampled serving A/B (VERDICT r4 item 4): the spec=0 row is the
    # baseline; the spec=2 row runs the engine's adaptive probation
    # (rejection-resampling verify stays distribution-exact,
    # tests/test_spec_sampling.py).  At random weights acceptance is ~0,
    # so the controller commits to the plain program ("spec_ab_choice":
    # "alt") after ONE short spec window; the residual gap vs the
    # baseline row is that fixed probation cost (+ pre-commit standalone
    # admissions), which amortizes toward zero on longer workloads —
    # 64 requests here keep it within a few percent.
    ("serve_v1_sampled", "serve",
     {"int8": "1", "temperature": "0.9", "top_p": "0.9", "top_k": "none",
      "requests": "64"}),
    ("serve_v1_spec2_sampled", "serve",
     {"spec": "2", "int8": "1", "temperature": "0.9", "top_p": "0.9",
      "top_k": "none", "requests": "64"}),
    ("t2i_v2_euler50", "t2i_v2", {}),
    ("t2i_v2_dpm20", "t2i_v2", {"sampler": "dpm", "steps": "20"}),
    ("t2v", "t2v", {}),
    # long-clip video: 9 latent = 33 pixel frames, chunked-streaming VAE
    # decode (constant memory in T) + streaming attention at S=6784
    ("t2v_long", "t2v", {"latent_frames": "9"}),
    # r5: prevent_cse=False un-broke the named-rung compiles (the r4
    # "crash the TPU compile helper" was optimization-barrier compile
    # blowup).  Parity rows keep the reference numerics (fp32 softmax;
    # v1 AdamW); the _fast rows are the throughput modes (bf16 scores;
    # v1 swaps AdamW for adafactor because AdamW moments + saved
    # activations exceed 16 GB under the lighter rungs).
    ("train_v1", "train", {}),
    ("train_v1_fast", "train",
     {"remat": "qkv_attn", "opt": "adafactor", "softmax": "bf16"}),
    ("train_v2", "train_v2",
     {"remat": "qkv_fc1_attn", "batch": "2"}),
    ("train_v2_fast", "train_v2",
     {"remat": "qkv_fc1_attn", "batch": "3", "softmax": "bf16"}),
]


def bench_suite(args) -> dict:
    """Run the whole surface; headline = v1 t2i 256^2 (vs the 150
    img/min north star), everything else under "metrics"."""
    import traceback

    metrics = {}
    for name, metric, extra in SUITE:
        sub = dict(args)
        sub.pop("metric", None)
        sub.update(extra)
        t0 = time.perf_counter()
        try:
            metrics[name] = BENCHES[metric](sub)
            metrics[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:                      # record, keep going
            traceback.print_exc(file=sys.stderr)
            metrics[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"[suite] {name}: "
              + json.dumps(metrics[name].get("value",
                                             metrics[name].get("error"))),
              file=sys.stderr, flush=True)
        # rows build jitted pipeline closures with reference cycles —
        # without an explicit collect + cache clear their device buffers
        # outlive the row and later rows RESOURCE_EXHAUSTED (r5 suite)
        import gc

        gc.collect()
        jax.clear_caches()
        gc.collect()
    head = metrics.get("t2i_256", {})
    return {
        "metric": "suite_headline_t2i_images_per_min_per_chip_256px_16steps",
        "value": head.get("value"), "unit": "images/min/chip",
        "vs_baseline": head.get("vs_baseline"),
        "metrics": metrics,
    }


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    metric = args.get("metric", "suite")
    fn = bench_suite if metric == "suite" else BENCHES[metric]
    print(json.dumps(fn(args)))


if __name__ == "__main__":
    main()
