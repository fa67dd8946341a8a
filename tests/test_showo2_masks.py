"""v2 omni mask + modality scatter parity tests."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from showo_tpu.show_o2.masks import (
    modality_gather,
    modality_scatter,
    omni_attn_mask,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "showo2_masks.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_showo2_masks.py")
    return np.load(GOLDEN)


def test_omni_attn_mask(golden):
    mp = jnp.asarray(golden["modality_positions"])
    got = omni_attn_mask(mp, L=24, inverted=False)
    np.testing.assert_array_equal(np.asarray(got), golden["mask"].astype(bool))


def test_modality_scatter(golden):
    out = modality_scatter(
        jnp.asarray(golden["input_embeds"]),
        jnp.asarray(golden["image_embeds"]),
        jnp.asarray(golden["time_embeds"]),
        jnp.asarray(golden["modality_positions"]),
        add_time_embeds=True,
    )
    np.testing.assert_allclose(np.asarray(out), golden["scattered"], atol=1e-6)


def test_scatter_gather_roundtrip(golden):
    mp = jnp.asarray(golden["modality_positions"])
    out = modality_scatter(
        jnp.asarray(golden["input_embeds"]),
        jnp.asarray(golden["image_embeds"]),
        jnp.asarray(golden["time_embeds"]),
        mp, add_time_embeds=True)
    N = golden["image_embeds"].shape[1] + 1
    spans = modality_gather(out, mp, N)  # [B*M, N, D]
    # first real span of row 0: time embed then image tokens
    np.testing.assert_allclose(np.asarray(spans[0, 0]),
                               golden["time_embeds"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(spans[0, 1:]),
                               golden["image_embeds"][0], atol=1e-6)
