"""Show-o2 text-to-image pipeline: flow-matching Euler ODE + CFG + VAE.

Ports show-o2/inference_t2i.py:130-195: prepare_gen_input (cond + null
pair), z ~ N(0,1) in latent space, CFG batch doubling, 50-step Euler with
time_shifting_factor over model.t2i_generate, WanVAE decode.  The entire
denoise loop compiles to one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.show_o2.formats import prepare_gen_input
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import Showo2Config, showo2_t2i_velocity
from showo_tpu.show_o2.transport import (ode_timegrid, sample_dpm_solver_pp,
                                         sample_ode_dopri5, sample_ode_euler,
                                         sample_ode_heun)
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_decode


@dataclasses.dataclass
class T2IV2Pipeline:
    cfg: Showo2Config
    params: dict
    vae_cfg: WanVAEConfig
    vae_params: dict
    tokenizer: object
    token_ids: dict           # {bos_id, eos_id, boi_id, eoi_id, pad_id, img_pad_id}
    guidance_scale: float = 7.5
    num_steps: int = 50
    time_shifting_factor: float = 3.0
    max_text_len: int = 256
    attn_impl: str = "auto"   # packed Pallas kernel at v2 sequence lengths
    sampling_method: str = "euler"  # euler | heun | dpm-solver | dopri5
    fuse_weights: bool = True  # qkv + gate/up wide-matmul fusions
    # prefix-KV caching: the text rows' K/V are constant across euler
    # steps in BOTH towers (they never attend into the image span), so
    # they are prefilled once and every step re-forwards only the span
    # rows — bit-identical outputs (tests/test_t2i_v2_cached.py), the v2
    # analog of the v1 cached MaskGIT.  Measured on-chip (r3 A/B, one
    # process, interleaved): cached 20.96/20.98 vs plain 21.85 img/min —
    # the per-layer K/V scatter + Q!=K kernel overhead outweighs the
    # ~25% row saving at the 432px text fraction, so OFF by default;
    # it wins only when text rows dominate the sequence.
    prefix_cache: bool = False

    def __post_init__(self):
        cfg = self.cfg
        if self.fuse_weights:
            from showo_tpu.show_o2.showo2 import fuse_inference

            self.params = fuse_inference(self.params)
        impl = self.attn_impl
        if impl == "auto":
            impl = ("pallas_packed" if cfg.num_image_tokens >= 512 else
                    "dense")
        self._impl = impl

        # static time grid, concrete at trace time (the dpm-solver coeffs
        # are host-side numpy over it)
        grid = ode_timegrid(self.num_steps,
                            time_shifting_factor=self.time_shifting_factor)

        @jax.jit
        def _denoise(params, z, text_tokens, bias, modality_positions, key):

            attn_meta = None
            if self._impl.startswith("pallas"):
                from showo_tpu.ops.flash_attention import (
                    seg_from_modality_positions)

                L = text_tokens.shape[1]
                seg = seg_from_modality_positions(modality_positions, L)
                B = text_tokens.shape[0]
                attn_meta = (self._impl, seg,
                             jnp.zeros((B, L), jnp.int32),
                             jnp.full((B,), -1, jnp.int32),
                             jnp.zeros((B,), jnp.int32))

            if self.prefix_cache:
                from showo_tpu.show_o2.showo2 import (
                    showo2_t2i_prefill, showo2_t2i_velocity_cached)

                qwen_kv, dit_kv = showo2_t2i_prefill(
                    cfg, params, text_tokens, bias, modality_positions,
                    attn_meta=attn_meta)
                n = cfg.num_image_tokens
                offs = modality_positions[:, 0, 0]
                idx = offs[:, None] + jnp.arange(n)
                bias_fresh = (None if bias is None else jnp.take_along_axis(
                    bias, idx[:, None, :, None], axis=2))

                def drift(x, t):
                    return showo2_t2i_velocity_cached(
                        cfg, params, x, t, bias_fresh, modality_positions,
                        qwen_kv, dit_kv,
                        guidance_scale=self.guidance_scale,
                        attn_meta=attn_meta)
            else:
                def drift(x, t):
                    return showo2_t2i_velocity(
                        cfg, params, text_tokens, x, t, bias,
                        modality_positions,
                        guidance_scale=self.guidance_scale,
                        attn_meta=attn_meta)

            method = self.sampling_method
            if method == "heun":
                return sample_ode_heun(drift, z, grid)
            if method in ("dpm-solver", "dpm"):
                return sample_dpm_solver_pp(drift, z, grid)
            if method == "dopri5":
                return sample_ode_dopri5(drift, z)
            return sample_ode_euler(drift, z, grid)

        @jax.jit
        def _decode(vae_params, z):
            # [B, C, h, w] -> [B, C, 1, h, w] -> pixels [B, 3, 1, H, W]
            out = wan_decode(self.vae_cfg, vae_params, z[:, :, None])
            return jnp.transpose(out[:, :, 0], (0, 2, 3, 1))  # NHWC

        self._denoise = _denoise
        self._decode = _decode

    def generate(self, prompts: Sequence[str], key) -> np.ndarray:
        """Returns NHWC float images in [-1, 1]."""
        cfg = self.cfg
        ids = self.token_ids
        toks, toks_null, mp, mp_null = prepare_gen_input(
            prompts, self.tokenizer, cfg.num_image_tokens,
            ids["bos_id"], ids["eos_id"], ids["boi_id"], ids["eoi_id"],
            ids["pad_id"], ids["img_pad_id"], self.max_text_len)

        B = len(prompts)
        h, w = cfg.image_latent_height, cfg.image_latent_width
        key, k_z = jax.random.split(key)
        z = jax.random.normal(k_z, (B, cfg.image_latent_dim, h, w))

        if self.guidance_scale > 0:
            text = jnp.asarray(np.concatenate([toks, toks_null], axis=0))
            mp_all = jnp.asarray(
                np.concatenate([mp[:, 0], mp_null[:, 0]], axis=0))[:, None]
            z = jnp.concatenate([z, z], axis=0)
        else:
            text = jnp.asarray(toks)
            mp_all = jnp.asarray(mp[:, 0])[:, None]

        # Denoise on the sequence truncated at the end of the image span:
        # prepare_gen_input (misc.py:24-54) places eoi/eos/pads AFTER the
        # span, and image rows attend only j < img_end (causal prefix +
        # bidirectional span), so the suffix rows contribute nothing to the
        # velocity — dropping them cuts ~25% of per-step FLOPs at short
        # prompts.  Rounded up to 128 to bucket compilations / fit the
        # packed kernel's block size.
        mp_r = mp_all.reshape(text.shape[0], -1, 2)
        img_end = int(np.max(np.asarray(mp_r[:, :, 0] + mp_r[:, :, 1])))
        L = min(text.shape[1], (img_end + 127) // 128 * 128)
        text = text[:, :L]
        bias = omni_attn_mask(mp_r, L)

        samples = self._denoise(self.params, z, text, bias, mp_r, key)
        samples = samples[:B]  # cond half
        return np.asarray(self._decode(self.vae_params, samples))
