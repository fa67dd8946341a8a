"""Prefix-cached MaskGIT with the Pallas kernel path (interpret mode)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from unittest import mock

from showo_tpu.models.showo import showo_t2i_generate_cached
from showo_tpu.ops import flash_attention as fa
from showo_tpu.utils.torch_import import phi_params_from_torch
from tests.test_maskgit import CFG, GOLDEN


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_maskgit.py")
    return np.load(GOLDEN)


def test_cached_pallas_token_exact(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = {"showo": jax.tree.map(jnp.asarray,
                                    phi_params_from_torch(sd, num_layers=2))}
    bias = jnp.where(jnp.asarray(golden["bias"]) < 0, -1e9, 0.0).astype(jnp.float32)

    orig = fa.omni_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        return orig(*args, **kw)

    with mock.patch.object(fa, "omni_attention", interp):
        tokens = showo_t2i_generate_cached(
            CFG, params,
            jnp.asarray(golden["input_ids"]),
            jax.random.PRNGKey(0),
            uncond_input_ids=jnp.asarray(golden["uncond_ids"]),
            attention_bias=bias,
            guidance_scale=1.75,
            temperature=1.1,
            timesteps=4,
            max_seq_length=5,
            injected_noise=(jnp.asarray(golden["g_sample"]),
                            jnp.asarray(golden["g_conf"])),
            use_pallas_attention=True,
            pad_id=99, soi_id=101, eoi_id=102,
        )
    np.testing.assert_array_equal(np.asarray(tokens), golden["tokens"])
