"""Show-o2 text/image-to-video pipeline (flow matching over video latents).

Video generation per the reference's video path (modeling_showo2_qwen2_5.py
video branches + t2i_generate with first_frame_as_cond for i2v): z ~ N(0,1)
over [C, T, h, w] latents, Euler ODE on the joint velocity, Wan VAE video
decode.  For i2v the first latent frame holds the encoded conditioning
image, its t is forced clean and its velocity zeroed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.show_o2.formats import prepare_gen_input
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import Showo2Config, showo2_t2i_velocity
from showo_tpu.show_o2.transport import ode_timegrid, sample_ode_euler
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_decode, wan_encode


@dataclasses.dataclass
class T2VPipeline:
    cfg: Showo2Config
    params: dict
    vae_cfg: WanVAEConfig
    vae_params: dict
    tokenizer: object
    token_ids: dict
    num_latent_frames: int = 5     # -> 4*(T-1)+1 = 17 pixel frames
    guidance_scale: float = 5.0
    num_steps: int = 50
    time_shifting_factor: float = 3.0
    max_text_len: int = 256
    fuse_weights: bool = True  # qkv + gate/up wide-matmul fusions
    # "auto" routes attention through the packed Pallas kernel at video
    # lengths (S ~ 215 + T*729: the dense path materializes fp32
    # [B,H,S,S] scores per layer — 1.4 GB of HBM traffic/layer at T=5);
    # "dense" keeps the additive-bias path
    attn_impl: str = "auto"
    # "auto": full-clip VAE decode below the threshold (faster — one fused
    # program), chunked-streaming decode above it (constant activation
    # memory in T — the reference's feat_cache path, wan_vae.py streaming
    # mode).  "full" / "streaming" force a path.
    vae_mode: str = "auto"
    vae_streaming_min_frames: int = 9   # latent frames

    def __post_init__(self):
        if self.fuse_weights:
            from showo_tpu.show_o2.showo2 import fuse_inference

            self.params = fuse_inference(self.params)

        # jit once (cached by shape across generate() calls): without
        # this, every call re-traced the 38-layer euler scan AND the
        # full video VAE decode — ~22 s of host tracing per video vs
        # ~3 s of device work (the round-5 t2v roofline finding)
        grid = ode_timegrid(self.num_steps,
                            time_shifting_factor=self.time_shifting_factor)

        import functools

        @functools.partial(jax.jit, static_argnums=(4,))
        def _denoise(params, z, text, mp_r, i2v):
            L = text.shape[1]
            impl = self._pick_impl(L)
            bias, attn_meta = None, None
            if impl.startswith("pallas"):
                from showo_tpu.ops.flash_attention import \
                    seg_from_modality_positions

                Bc = text.shape[0]
                seg = seg_from_modality_positions(mp_r, L)
                attn_meta = (impl, seg, jnp.zeros((Bc, L), jnp.int32),
                             jnp.full((Bc,), -1, jnp.int32),
                             jnp.zeros((Bc,), jnp.int32))
            else:
                bias = omni_attn_mask(mp_r, L)

            def drift(x, t):
                return showo2_t2i_velocity(
                    self.cfg, params, text, x, t, bias, mp_r,
                    guidance_scale=self.guidance_scale,
                    first_frame_as_cond=i2v,
                    num_frames=self.num_latent_frames,
                    attn_meta=attn_meta)

            return sample_ode_euler(drift, z, grid)

        @jax.jit
        def _decode_full(vae_params, z):
            return wan_decode(self.vae_cfg, vae_params, z)

        @jax.jit
        def _decode_streaming(vae_params, z):
            from showo_tpu.show_o2.wan_vae import wan_decode_streaming

            return wan_decode_streaming(self.vae_cfg, vae_params, z)

        self._denoise = _denoise
        self._decode_full = _decode_full
        self._decode_streaming = _decode_streaming

    @property
    def num_video_tokens(self) -> int:
        per = ((self.cfg.image_latent_height // self.cfg.patch_size)
               * (self.cfg.image_latent_width // self.cfg.patch_size))
        return (self.num_latent_frames * per
                + (1 if self.cfg.add_time_embeds else 0))

    def _pick_impl(self, L: int) -> str:
        impl = self.attn_impl
        if impl != "auto":
            return impl
        # packed holds the full KV in VMEM (fastest, but Sp*KVD must fit
        # the ~16 MB scoped-vmem stack: Sp <= ~3k at KVD=512); the
        # online-softmax streaming kernel has no S ceiling and beat
        # dense 30x at S=8192 (STATUS.md streaming table)
        if self.num_video_tokens < 512:
            return "dense"
        return "pallas_packed" if L <= 2816 else "pallas_streaming"

    def generate(self, prompts: Sequence[str], key,
                 first_frame_nhwc: Optional[np.ndarray] = None) -> np.ndarray:
        """Returns pixel videos [B, T_pix, H, W, 3] in [-1, 1].  Passing
        ``first_frame_nhwc`` switches to image-to-video conditioning."""
        cfg = self.cfg
        ids = self.token_ids
        i2v = first_frame_nhwc is not None
        toks, toks_null, mp, mp_null = prepare_gen_input(
            prompts, self.tokenizer, self.num_video_tokens,
            ids["bos_id"], ids["eos_id"],
            ids.get("bov_id", ids["boi_id"]),
            ids.get("eov_id", ids["eoi_id"]),
            ids["pad_id"], ids.get("vid_pad_id", ids["img_pad_id"]),
            self.max_text_len)

        B = len(prompts)
        h, w = cfg.image_latent_height, cfg.image_latent_width
        T = self.num_latent_frames
        key, k_z = jax.random.split(key)
        z = jax.random.normal(k_z, (B, cfg.image_latent_dim, T, h, w))

        if i2v:
            key, k_enc = jax.random.split(key)
            pix = jnp.transpose(jnp.asarray(first_frame_nhwc), (2, 0, 1))
            pix = jnp.broadcast_to(pix[None, :, None], (B, 3, 1, *pix.shape[1:]))
            frame0 = wan_encode(self.vae_cfg, self.vae_params, pix, k_enc)
            z = z.at[:, :, :1].set(frame0)

        if self.guidance_scale > 0:
            text = jnp.asarray(np.concatenate([toks, toks_null], axis=0))
            mp_all = jnp.asarray(np.concatenate([mp[:, 0], mp_null[:, 0]],
                                                axis=0))[:, None]
            z = jnp.concatenate([z, z], axis=0)
        else:
            text = jnp.asarray(toks)
            mp_all = jnp.asarray(mp[:, 0])[:, None]

        # Truncate at span end: suffix rows (eoi/eos/pads) are invisible to
        # the video rows (see t2i_v2.py) — same ~25% per-step saving.
        mp_r = mp_all.reshape(text.shape[0], -1, 2)
        span_end = int(np.max(np.asarray(mp_r[:, :, 0] + mp_r[:, :, 1])))
        L = min(text.shape[1], (span_end + 127) // 128 * 128)
        text = text[:, :L]

        out = self._denoise(self.params, z, jnp.asarray(text), mp_r,
                            i2v)[:B]
        streaming = (self.vae_mode == "streaming"
                     or (self.vae_mode == "auto"
                         and T >= self.vae_streaming_min_frames))
        dec = self._decode_streaming if streaming else self._decode_full
        videos = dec(self.vae_params, out)
        return np.asarray(jnp.transpose(videos, (0, 2, 3, 4, 1)))
