"""t2v attention-routing A/B: dense bias vs packed Pallas kernel.

Numerics: one 2-step generation with the SAME key under both routings
must agree (the kernel computes the same masked softmax; online
accumulation reorders sums, so tolerance is bf16-level).  Perf: euler
velocity wall-clock per step at the video sequence length.

Run: python tools/probe_t2v_ab.py [latent_frames=2] [steps=2]
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
    frames = int(args.get("latent_frames", 2))
    steps = int(args.get("steps", 2))

    from showo_tpu.pipelines.t2v import T2VPipeline
    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    cfg = Showo2Config()
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(lambda k: init_wan_vae_params(
        vae_cfg, k, jnp.bfloat16))(jax.random.PRNGKey(1))

    class Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7] * 16}

    ids = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
               img_pad_id=6, vid_pad_id=7)

    outs = {}
    for impl in ("dense", "pallas_packed"):
        pipe = T2VPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                           vae_params=vae_params, tokenizer=Tok(),
                           token_ids=ids, num_latent_frames=frames,
                           guidance_scale=5.0, num_steps=steps,
                           max_text_len=256, attn_impl=impl)
        out = pipe.generate(["a"], jax.random.PRNGKey(2))   # compile+run
        t0 = time.perf_counter()
        out = pipe.generate(["a"], jax.random.PRNGKey(2))
        dt = time.perf_counter() - t0
        outs[impl] = np.asarray(out)
        print(f"{impl:14s}: {dt * 1e3:8.1f} ms / {steps}-step generation "
              f"(S = {215 + frames * 729})")

    d = np.abs(outs["dense"].astype(np.float32)
               - outs["pallas_packed"].astype(np.float32))
    print(f"max |dense - packed| = {d.max():.5f}  "
          f"(rms {np.sqrt((d ** 2).mean()):.6f})")


if __name__ == "__main__":
    main()
