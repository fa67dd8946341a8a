"""Interleaved A/B: v2 t2i plain euler vs prefix-KV cached windows.

Round-3 verdict on the cached path was a loss (20.96 vs 21.85 img/min)
because the window forward still paid the full span-modulation one-hot
einsum per layer.  With span_modulation(full_span=True) the cached
window collapses modulation to [B,1,D] broadcasts — re-A/B in ONE
process, interleaved, to decide the default.

Run: python tools/probe_t2iv2_cached_ab.py [steps=50] [iters=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    steps = int(args.get("steps", 50))
    iters = int(args.get("iters", 3))

    from showo_tpu.pipelines.t2i_v2 import T2IV2Pipeline
    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params
    import dataclasses

    cfg = Showo2Config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=28),
        dit=dataclasses.replace(cfg.dit, scan_unroll=10))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(
        lambda k: init_wan_vae_params(vae_cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(1))

    class Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7] * 16}

    ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
               img_pad_id=6)

    def make(cached):
        return T2IV2Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                             vae_params=vae_params, tokenizer=Tok(),
                             token_ids=ids, guidance_scale=7.5,
                             num_steps=steps, max_text_len=256,
                             prefix_cache=cached, fuse_weights=True)

    plain, cached = make(False), make(True)
    prompts = ["a"]
    # warm both
    np.asarray(plain.generate(prompts, jax.random.PRNGKey(2))[:, :2, :2])
    np.asarray(cached.generate(prompts, jax.random.PRNGKey(2))[:, :2, :2])

    tp, tc = [], []
    for i in range(iters):
        t0 = time.perf_counter()
        out = plain.generate(prompts, jax.random.PRNGKey(3 + i))
        np.asarray(out[:, :2, :2])
        tp.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = cached.generate(prompts, jax.random.PRNGKey(3 + i))
        np.asarray(out[:, :2, :2])
        tc.append(time.perf_counter() - t0)
    for name, ts in (("plain", tp), ("cached+full_span", tc)):
        ts = sorted(ts)
        best = ts[0]
        print(f"{name:18s} best {best*1e3:7.1f} ms  "
              f"{60.0/best:6.2f} img/min  (all: "
              + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
