"""Perf probe: t2i cached-MaskGIT per-step cost vs overhead, batch scaling.

Runs on the real chip.  Prints one line per config:
  probe timesteps=T batch=B dt_ms=...
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import fuse_qkv
from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                    showo_t2i_generate_cached)
from showo_tpu.ops.masks import omni_mask_predict_next

PAD, SOI, EOI = 50295, 50296, 50297


def run(cfg, params, batch, timesteps):
    rng = jax.random.PRNGKey(1)
    text = jax.random.randint(rng, (batch, 130), 2, 50000)
    img = jnp.full((batch, cfg.num_vq_tokens), cfg.mask_token_id)
    ids = jnp.concatenate(
        [text, jnp.full((batch, 1), SOI), img, jnp.full((batch, 1), EOI)],
        axis=1).astype(jnp.int32)

    @jax.jit
    def build_bias(full_ids):
        return omni_mask_predict_next(full_ids, pad_id=PAD, soi_id=SOI,
                                      eoi_id=EOI, rm_pad_in_image=True,
                                      dtype=jnp.bfloat16)

    bias = build_bias(jnp.concatenate([ids, ids], axis=0))

    @jax.jit
    def generate(params, ids, bias, key):
        return showo_t2i_generate_cached(
            cfg, params, ids, key, uncond_input_ids=ids,
            attention_bias=bias, guidance_scale=1.75,
            timesteps=timesteps, max_seq_length=128,
            pad_id=PAD, soi_id=SOI, eoi_id=EOI)

    np.asarray(generate(params, ids, bias, jax.random.PRNGKey(2)))
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out = generate(params, ids, bias, jax.random.PRNGKey(3 + i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"probe timesteps={timesteps} batch={batch} dt_ms={dt*1000:.1f} "
          f"img_per_min={batch*60.0/dt:.1f}", flush=True)


def main():
    cfg = ShowoConfig()
    params = jax.jit(
        lambda k: init_showo_params(cfg, k, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_qkv(params["showo"]))
    jax.block_until_ready(params)
    print("devices:", jax.devices(), flush=True)

    for t in (1, 4, 16):
        run(cfg, params, 2, t)
    for b in (4, 8, 16):
        run(cfg, params, b, 16)


if __name__ == "__main__":
    main()
