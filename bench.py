"""Benchmark: Show-o 1.3B T2I 256^2 throughput (16-step MaskGIT + CFG).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star: 150 images/min/chip (BASELINE.md).

Run on the real chip:  python bench.py  [batch=8] [timesteps=16]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batch = int(args.get("batch", 8))
    timesteps = int(args.get("timesteps", 16))
    use_pallas = args.get("attn", "dense") == "pallas"
    mode = args.get("mode", "cached")  # cached = prefix-KV MaskGIT

    from showo_tpu.models.phi import PhiConfig
    from showo_tpu.models.showo import (
        ShowoConfig, init_showo_params, showo_t2i_generate)
    from showo_tpu.ops.masks import omni_mask_predict_next

    cfg = ShowoConfig()
    # init under one jit: per-leaf dispatch through the device tunnel is slow
    params = jax.jit(
        lambda k: init_showo_params(cfg, k, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
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
                timesteps=timesteps, max_seq_length=128)
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
    print(json.dumps({
        "metric": f"t2i_images_per_min_per_chip_256px_{timesteps}steps",
        "value": round(imgs_per_min, 2),
        "unit": "images/min/chip",
        "vs_baseline": round(imgs_per_min / 150.0, 3),
    }))


if __name__ == "__main__":
    main()
