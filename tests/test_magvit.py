"""MAGVIT-v2 codec parity vs. reference-generated golden fixtures."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.magvit import (
    MagvitV2,
    VQConfig,
    lfq_codebook_entry,
    lfq_indices,
    lfq_losses,
)
from showo_tpu.utils.torch_import import magvit_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "magvit_tiny.npz")

TINY = VQConfig(
    ch=32,
    enc_ch_mult=(1, 2),
    enc_num_res_blocks=(1, 1),
    dec_ch_mult=(1, 2),
    dec_num_res_blocks=(1, 2),
    z_channels=4,
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_magvit.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    return magvit_params_from_torch(
        sd, enc_ch_mult=TINY.enc_ch_mult, enc_blocks=TINY.enc_num_res_blocks,
        dec_ch_mult=TINY.dec_ch_mult, dec_blocks=TINY.dec_num_res_blocks,
        ch=TINY.ch,
    )


def test_encoder_parity(golden, params):
    model = MagvitV2(TINY)
    x = jnp.asarray(golden["x"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    z_q, codes = model.apply({"params": params}, x, method=model.encode)
    # pre-quant activations must agree to fp32 conv tolerance
    z = golden["z"].transpose(0, 2, 3, 1)
    from showo_tpu.models.magvit import VQGANEncoder

    zj = VQGANEncoder(TINY).apply({"params": params["encoder"]}, x)
    np.testing.assert_allclose(np.asarray(zj), z, atol=5e-5, rtol=1e-4)
    # codes must agree everywhere the activation isn't within conv noise of
    # the sign boundary (a |z|<1e-4 flip is accumulation-order dependent)
    codes_np = np.asarray(codes).reshape(-1)
    want = golden["codes"].reshape(-1)
    stable = (np.abs(z.reshape(-1, TINY.z_channels)) > 1e-4).all(axis=-1)
    assert (codes_np == want)[stable].all()
    assert stable.mean() > 0.95


def test_roundtrip_parity(golden, params):
    model = MagvitV2(TINY)
    codes = jnp.asarray(golden["codes"])
    recon = model.apply({"params": params}, codes, method=model.decode_code)
    want = golden["recon"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(recon), want, atol=2e-4, rtol=1e-3)


def test_lfq_bit_packing_roundtrip():
    codes = jnp.arange(16)
    z = lfq_codebook_entry(codes, codebook_dim=4)
    assert np.array_equal(np.asarray(lfq_indices(z, codebook_dim=4)), np.arange(16))


def test_lfq_losses(golden):
    x = jnp.asarray(golden["x"]).transpose(0, 2, 3, 1)
    model = MagvitV2(TINY)
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = magvit_params_from_torch(
        sd, enc_ch_mult=TINY.enc_ch_mult, enc_blocks=TINY.enc_num_res_blocks,
        dec_ch_mult=TINY.dec_ch_mult, dec_blocks=TINY.dec_num_res_blocks,
        ch=TINY.ch,
    )
    z = model.apply({"params": params["encoder"]}, x,
                    method=None) if False else None
    # run encoder directly for pre-quant activations
    from showo_tpu.models.magvit import VQGANEncoder

    enc = VQGANEncoder(TINY)
    zpre = enc.apply({"params": params["encoder"]}, x)
    losses = lfq_losses(zpre.reshape(-1, TINY.z_channels))
    np.testing.assert_allclose(
        float(losses["entropy_loss"]) * 0.1, golden["entropy_loss"], atol=1e-5
    )
    np.testing.assert_allclose(
        float(losses["commit_loss"]) * 0.1, golden["quantizer_loss"], atol=1e-5
    )


def test_vq_roundtrip_real_image_harness():
    """BASELINE verification config (1) machinery: real dog.png through the
    codec roundtrip; PSNR computable (quality needs real weights)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "eval_vq_psnr.py"),
         "resolution=64", "platform=cpu"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "vq_roundtrip_psnr=" in out.stdout
