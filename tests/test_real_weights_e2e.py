"""Weights-gated end-to-end checks against REAL released checkpoints.

These run only when the checkpoints are present locally (set
SHOWO_WEIGHTS_DIR or place them under ./weights/):

    weights/show-o/pytorch_model.bin           (showlab/show-o)
    weights/magvitv2/pytorch_model.bin         (showlab/magvitv2)
    weights/Wan2.1_VAE.pth
    weights/show-o2-1.5B/pytorch_model.bin

Without weights every test SKIPS (the key/shape layer is covered
unconditionally by test_import_manifests.py).
"""

import os

import numpy as np
import pytest

WEIGHTS = os.environ.get(
    "SHOWO_WEIGHTS_DIR",
    os.path.join(os.path.dirname(__file__), "..", "weights"))


def _need(*parts):
    path = os.path.join(WEIGHTS, *parts)
    if not os.path.exists(path):
        pytest.skip(f"weights not present: {path}")
    return path


def test_magvit_roundtrip_psnr_real():
    """showlab/magvitv2 encode->decode on a natural image: PSNR must be in
    the published quality band (BASELINE.json config 1)."""
    import jax.numpy as jnp
    from PIL import Image

    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.utils.checkpoint import load_magvit_weights

    path = _need("magvitv2")
    params = load_magvit_weights(path)
    from showo_tpu.utils.assets import validation_image

    img_path = validation_image()
    if img_path is None:
        pytest.skip("no validation image available")
    img = Image.open(img_path).convert("RGB").resize((256, 256))
    x = jnp.asarray(np.asarray(img), jnp.float32) / 127.5 - 1.0

    model = MagvitV2(VQConfig())
    codes = model.apply({"params": params}, x[None], method=model.get_code)
    recon = model.apply({"params": params}, codes, method=model.decode_code)
    mse = float(jnp.mean(jnp.square(jnp.clip(recon, -1, 1) - x[None])))
    psnr = 10 * np.log10(4.0 / mse)
    assert psnr > 20.0, psnr  # garbage import would land near ~10 dB


def test_showo_t2i_real_sane():
    """showlab/show-o t2i 256^2: generated tokens decode to an image with
    non-degenerate statistics (a wrong key mapping produces noise or a
    constant field)."""
    import jax

    from showo_tpu.models.magvit import VQConfig
    from showo_tpu.pipelines.t2i import T2IPipeline
    from showo_tpu.prompting import UniversalPrompting
    from showo_tpu.utils.checkpoint import (
        load_magvit_weights,
        load_showo_weights,
    )

    showo_path = _need("show-o")
    vq_path = _need("magvitv2")
    from transformers import AutoTokenizer

    try:
        tok = AutoTokenizer.from_pretrained("microsoft/phi-1_5",
                                            padding_side="left")
    except Exception:
        pytest.skip("phi tokenizer unavailable offline")

    from showo_tpu.models.showo import ShowoConfig

    cfg = ShowoConfig()
    params = load_showo_weights(showo_path)
    vq_params = load_magvit_weights(vq_path)
    uni = UniversalPrompting(tok, max_text_len=128, cond_dropout_prob=0.0)
    pipe = T2IPipeline(cfg=cfg, params=params, vq_cfg=VQConfig(),
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=1.75, timesteps=16,
                       max_seq_length=128, resolution=256)
    images = np.asarray(pipe.generate(["a photo of a dog"],
                                      jax.random.PRNGKey(0)))
    assert images.shape[-3:-1] == (256, 256)
    # sane dynamic range and spatial structure
    assert images.std() > 0.05, "constant output — import likely broken"
    assert np.isfinite(images).all()


def test_wan_vae_roundtrip_real():
    """Wan2.1_VAE.pth image roundtrip PSNR (BASELINE.json config 1)."""
    import jax
    import jax.numpy as jnp

    from showo_tpu.show_o2.wan_vae import (
        WanVAEConfig,
        wan_decode,
        wan_encode,
    )
    from showo_tpu.utils.checkpoint import load_wan_vae_weights

    path = _need("Wan2.1_VAE.pth")
    params = load_wan_vae_weights(path)
    cfg = WanVAEConfig()
    rng = np.random.default_rng(0)
    # smooth synthetic image (natural-image-like low frequency content)
    g = rng.normal(size=(1, 3, 1, 32, 32)).astype(np.float32)
    x = jnp.asarray(np.repeat(np.repeat(g, 8, -1), 8, -2))  # 256x256
    z = wan_encode(cfg, params, x, jax.random.PRNGKey(0), deterministic=True)
    recon = wan_decode(cfg, params, z)
    mse = float(jnp.mean(jnp.square(jnp.clip(recon, -1, 1) - jnp.clip(x, -1, 1))))
    psnr = 10 * np.log10(4.0 / mse)
    assert psnr > 18.0, psnr
