"""Export -> reimport round-trip for Showo weights."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.utils.torch_export import (
    save_safetensors,
    showo_state_dict,
)
from showo_tpu.utils.torch_import import phi_params_from_torch


def test_roundtrip(tmp_path):
    cfg = ShowoConfig(
        vocab_size=128, llm_vocab_size=100, num_new_special_tokens=3,
        codebook_size=16, num_vq_tokens=8,
        llm=PhiConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4))
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    sd = showo_state_dict(params, num_layers=2)

    path = str(tmp_path / "model.safetensors")
    save_safetensors(sd, path)

    from safetensors.numpy import load_file

    loaded = load_file(path)
    back = phi_params_from_torch(loaded, num_layers=2)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params["showo"])[0][:8],
            jax.tree_util.tree_flatten_with_path(back)[0][:8]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))
