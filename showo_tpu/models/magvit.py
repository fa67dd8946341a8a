"""MAGVIT-v2 VQGAN with lookup-free quantization (LFQ), TPU-native.

Re-implements the reference codec (models/modeling_magvitv2.py,
models/common_modules.py) as flax modules in NHWC layout (TPU conv native
format).  LFQ is pure bit arithmetic — quantize = sign, index = binary
weighting, codebook lookup = bit-unpack — no codebook matmul anywhere.

Reference architecture facts (modeling_magvitv2.py:48-169, 277-399):
  encoder: conv_in 3->128, ch_mult [1,2,2,4,4] x blocks [4,3,4,3,4],
           mid (res+attn+res), GN/swish, conv_out -> z=13, quant_conv 1x1
  decoder: post_quant_conv 1x1, conv_in 13->512, mid, ch_mult [1,1,2,2,4]
           x blocks [4,4,3,4,3] reversed traversal, GN/swish, conv_out -> 3
  attn_resolutions=[5] never matches the actual level resolutions
  (256..16), so attention only appears in the two `mid` blocks.
  LFQ (modeling_magvitv2.py:172-274): codebook = all 2^13 sign patterns;
  index bit k (MSB-first) = [z_c > 0] with power_vals = 2^(12..0).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.GroupNorm):
    """GroupNorm(32, eps=1e-6) as in common_modules.py:21-24."""

    num_groups: int = 32
    epsilon: float = 1e-6


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = GroupNorm(name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = GroupNorm(name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid
    (common_modules.py:168-211)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(name="norm")(x)
        q = nn.Conv(C, (1, 1), name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), name="v")(h).reshape(B, H * W, C)
        w = jnp.einsum("bic,bjc->bij", q, k) * (C ** -0.5)
        w = jax.nn.softmax(w, axis=2)
        out = jnp.einsum("bij,bjc->bic", w, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric (0,1) pad
    (common_modules.py:73-90)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID", name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x + conv3x3 (common_modules.py:27-40)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, name="conv")(x)


@dataclass(frozen=True)
class VQConfig:
    ch: int = 128
    enc_ch_mult: Sequence[int] = (1, 2, 2, 4, 4)
    enc_num_res_blocks: Sequence[int] = (4, 3, 4, 3, 4)
    dec_ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    dec_num_res_blocks: Sequence[int] = (4, 4, 3, 4, 3)
    z_channels: int = 13
    in_ch: int = 3
    out_ch: int = 3


class VQGANEncoder(nn.Module):
    cfg: VQConfig = VQConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        num_res = len(cfg.enc_ch_mult)
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.enc_ch_mult[i_level]
            for i_block in range(cfg.enc_num_res_blocks[i_level]):
                h = ResnetBlock(block_out, name=f"down_{i_level}_block_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = GroupNorm(name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(cfg.z_channels, (3, 3), padding=1, name="conv_out")(h)
        h = nn.Conv(cfg.z_channels, (1, 1), name="quant_conv")(h)
        return h


class VQGANDecoder(nn.Module):
    cfg: VQConfig = VQConfig()

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        num_res = len(cfg.dec_ch_mult)
        h = nn.Conv(cfg.z_channels, (1, 1), name="post_quant_conv")(z)
        h = nn.Conv(cfg.ch * cfg.dec_ch_mult[-1], (3, 3), padding=1, name="conv_in")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.dec_ch_mult[i_level]
            for i_block in range(cfg.dec_num_res_blocks[i_level]):
                h = ResnetBlock(block_out, name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                h = Upsample(name=f"up_{i_level}_upsample")(h)
        h = GroupNorm(name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(cfg.out_ch, (3, 3), padding=1, name="conv_out")(h)
        return h


# ---------------------------------------------------------------------------
# LFQ: pure bit arithmetic (modeling_magvitv2.py:172-274)
# ---------------------------------------------------------------------------

def lfq_quantize(z: jnp.ndarray) -> jnp.ndarray:
    """sign(z) in {-1, +1} with a straight-through estimator."""
    q = jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)
    return z + jax.lax.stop_gradient(q - z)


def lfq_indices(z_q: jnp.ndarray, codebook_dim: int = 13) -> jnp.ndarray:
    """[..., codebook_dim] sign tensor -> integer codes.

    Bit weighting matches modeling_magvitv2.py:201-206: channel c carries
    2^(codebook_dim-1-c).
    """
    power = (2 ** jnp.arange(codebook_dim - 1, -1, -1)).astype(jnp.int32)
    bits = (z_q > 0).astype(jnp.int32)
    return jnp.sum(bits * power, axis=-1)


def lfq_codebook_entry(indices: jnp.ndarray, codebook_dim: int = 13) -> jnp.ndarray:
    """Integer codes -> sign vectors in {-1,+1}, [..., codebook_dim]
    (bit-unpack; modeling_magvitv2.py:186-196, 208-221)."""
    shifts = jnp.arange(codebook_dim - 1, -1, -1)
    bits = (indices[..., None] >> shifts) & 1
    return bits.astype(jnp.float32) * 2.0 - 1.0


def lfq_losses(z: jnp.ndarray, beta: float = 0.25) -> dict:
    """Entropy + commitment losses (modeling_magvitv2.py:246-263).

    z: [N, d] pre-quantization activations (flattened spatial x channel).
    """
    z_q = jnp.where(z > 0, 1.0, -1.0)
    # categorical over {+1, -1} with logits = -(z -/+ 1)^2
    logit_pos = -jnp.square(z - 1.0)
    logit_neg = -jnp.square(z + 1.0)
    logits = jnp.stack([logit_pos, logit_neg], axis=-1)  # [N, d, 2]
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    entropy = -jnp.sum(p * logp, axis=-1).mean()
    mean_p = p.mean(axis=0)  # [d, 2]: per-channel marginal over the batch
    mean_entropy = (-jnp.sum(mean_p * jnp.log(jnp.clip(mean_p, 1e-20)),
                             axis=-1)).mean()
    commit = jnp.mean(jnp.square(jax.lax.stop_gradient(z_q) - z)) + beta * jnp.mean(
        jnp.square(z_q - jax.lax.stop_gradient(z))
    )
    return {"entropy_loss": entropy - mean_entropy, "commit_loss": commit}


# ---------------------------------------------------------------------------
# Facade mirroring MAGVITv2.{encode,get_code,decode_code}
# ---------------------------------------------------------------------------


class MagvitV2(nn.Module):
    """encode/get_code/decode_code facade (modeling_magvitv2.py:402-433).

    Pixels are NHWC in [-1, 1]; codes are [B, H/16 * W/16] int32.
    """

    cfg: VQConfig = VQConfig()

    def setup(self):
        self.encoder = VQGANEncoder(self.cfg, name="encoder")
        self.decoder = VQGANDecoder(self.cfg, name="decoder")

    def encode(self, pixels):
        z = self.encoder(pixels)
        z_q = lfq_quantize(z)
        codes = lfq_indices(z_q, self.cfg.z_channels).reshape(pixels.shape[0], -1)
        return z_q, codes

    def get_code(self, pixels):
        return self.encode(pixels)[1]

    def decode_code(self, codes, hw: tuple | None = None):
        b, n = codes.shape
        if hw is None:
            side = int(round(n ** 0.5))
            hw = (side, side)
        z_q = lfq_codebook_entry(codes, self.cfg.z_channels).reshape(
            b, hw[0], hw[1], self.cfg.z_channels
        )
        return self.decoder(z_q)

    def __call__(self, pixels):
        # init-time touch of both halves
        z_q, codes = self.encode(pixels)
        return self.decode_code(codes)
