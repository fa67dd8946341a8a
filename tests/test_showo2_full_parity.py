"""Full Show-o2 model parity vs the reference, via the composed importer."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.ops.masks import to_additive
from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import (
    Showo2Config,
    showo2_forward,
    showo2_t2i_velocity,
)
from showo_tpu.show_o2.siglip import SigLipConfig
from showo_tpu.utils.torch_import import showo2_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "showo2_full.npz")

TINY = Showo2Config(
    llm=Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                    rope_theta=1e6, tie_word_embeddings=True),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=16),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=8,
    image_latent_height=8,
    image_latent_width=8,
    patch_size=2,
    clip_latent_dim=48,
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_showo2.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    return jax.tree.map(jnp.asarray, showo2_params_from_torch(
        sd, num_llm_layers=2, num_siglip_layers=2, num_dit_layers=2))


def test_training_forward_parity(golden, params):
    bias = to_additive(jnp.asarray(golden["mask_bool"]))
    out = showo2_forward(
        TINY, params,
        jnp.asarray(golden["text"]),
        jnp.asarray(golden["latents"]),
        jnp.asarray(golden["t"]),
        bias,
        jnp.asarray(golden["mp"]),
        text_labels=jnp.asarray(golden["labels"]),
        image_labels=jnp.asarray(golden["ut"]),
        image_masks=jnp.asarray(golden["img_mask"]),
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), golden["logits"],
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(out["loss_ntp"]), golden["loss_ntp"],
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["loss_flow"]), golden["loss_flow"],
                               atol=1e-5, rtol=1e-4)


def test_velocity_parity(golden, params):
    bias = to_additive(jnp.asarray(golden["mask_bool"]))
    v = showo2_t2i_velocity(
        TINY, params,
        jnp.asarray(golden["text"]),
        jnp.asarray(golden["latents"]),
        jnp.asarray(golden["t"]),
        bias,
        jnp.asarray(golden["mp"]),
        guidance_scale=0.0)
    np.testing.assert_allclose(np.asarray(v), golden["v"], atol=1e-4,
                               rtol=1e-3)
