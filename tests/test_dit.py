"""DiT head parity: ModulatedAttentionBlock stack + FinalLayer + TimestepEmbedder."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.ops.masks import to_additive
from showo_tpu.show_o2.dit import (
    DiffusionHeadConfig,
    dit_forward,
    final_layer_apply,
    time_embed_apply,
)
from showo_tpu.utils.torch_import import (
    dit_params_from_torch,
    final_layer_params_from_torch,
    time_embed_params_from_torch,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dit_tiny.npz")

TINY = DiffusionHeadConfig(hidden_size=64, intermediate_size=128,
                           num_heads=4, num_kv_heads=2, head_dim=16,
                           num_layers=2)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_dit.py")
    return np.load(GOLDEN)


def test_time_embedder_parity(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    p = jax.tree.map(jnp.asarray, time_embed_params_from_torch(sd, "temb."))
    out = time_embed_apply(p, jnp.asarray(golden["t"]), jnp.float32,
                           freq_dim=256)
    np.testing.assert_allclose(np.asarray(out), golden["adaln"], atol=2e-5,
                               rtol=1e-4)


def test_dit_stack_parity(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = jax.tree.map(jnp.asarray, dit_params_from_torch(sd, 2, "blocks."))
    bias = to_additive(jnp.asarray(golden["mask"]))
    h = dit_forward(TINY, params, jnp.asarray(golden["x"]),
                    jnp.asarray(golden["adaln"]), bias,
                    jnp.asarray(golden["modality_positions"]))
    np.testing.assert_allclose(np.asarray(h), golden["h_out"], atol=5e-5,
                               rtol=1e-4)

    fp = jax.tree.map(jnp.asarray, final_layer_params_from_torch(sd, "final."))
    v = final_layer_apply(fp, h, jnp.asarray(golden["adaln"]),
                          jnp.asarray(golden["modality_positions"]))
    np.testing.assert_allclose(np.asarray(v), golden["v_out"], atol=5e-5,
                               rtol=1e-4)


def test_dit_fused_inference_parity(golden):
    """fuse_qkv + fuse_gate_up on the DiT head are numerically identical
    (VERDICT r2 item 2: the v2 analog of models/phi.py:184-232)."""
    from showo_tpu.show_o2.dit import fuse_inference

    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = jax.tree.map(jnp.asarray, dit_params_from_torch(sd, 2, "blocks."))
    bias = to_additive(jnp.asarray(golden["mask"]))
    h = dit_forward(TINY, params, jnp.asarray(golden["x"]),
                    jnp.asarray(golden["adaln"]), bias,
                    jnp.asarray(golden["modality_positions"]))
    fused = fuse_inference(params)
    assert "qkv" in fused["layers"] and "gu" in fused["layers"]
    h_f = dit_forward(TINY, fused, jnp.asarray(golden["x"]),
                      jnp.asarray(golden["adaln"]), bias,
                      jnp.asarray(golden["modality_positions"]))
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h), atol=2e-5,
                               rtol=2e-5)


def test_dit_packed_kernel_routing_parity(golden):
    """attn_meta=pallas_packed routes the DiT head through the packed
    omni kernel (interpret mode) — must match the dense path."""
    from unittest import mock

    from showo_tpu.ops import flash_attention as fa
    from showo_tpu.ops.flash_attention import seg_from_modality_positions
    from showo_tpu.utils.torch_import import dit_params_from_torch

    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = jax.tree.map(jnp.asarray, dit_params_from_torch(sd, 2, "blocks."))
    bias = to_additive(jnp.asarray(golden["mask"]))
    mp = jnp.asarray(golden["modality_positions"])
    x = jnp.asarray(golden["x"])
    B, L = x.shape[0], x.shape[1]
    dense = dit_forward(TINY, params, x, jnp.asarray(golden["adaln"]), bias,
                        mp)

    seg = seg_from_modality_positions(mp, L)
    pad = jnp.zeros((B, L), jnp.int32)
    last_pad = jnp.full((B,), -1, jnp.int32)
    prefix = jnp.zeros((B,), jnp.int32)
    orig = fa.omni_attention_packed

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        return orig(*args, **kw)

    with mock.patch.object(fa, "omni_attention_packed", interp):
        packed = dit_forward(TINY, params, x, jnp.asarray(golden["adaln"]),
                             None, mp,
                             attn_meta=("pallas_packed", seg, pad, last_pad,
                                        prefix))
    np.testing.assert_allclose(np.asarray(packed), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_full_span_fast_path_exact():
    """span_modulation(full_span=True) must be bit-identical to the
    one-hot einsum when the single span covers every row — the static
    fast path the cached-window t2i velocity uses (mp_fresh = (0, n))."""
    from showo_tpu.show_o2.dit import init_dit_params, init_final_layer_params

    B, L = 2, 24
    key = jax.random.PRNGKey(0)
    params = init_dit_params(TINY, key, jnp.bfloat16)
    h = jax.random.normal(key, (B, L, TINY.hidden_size), jnp.bfloat16)
    # non-zero adaln kernels so modulation actually does something
    params["layers"]["adaln"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(1),
        params["layers"]["adaln"]["kernel"].shape) .astype(jnp.bfloat16) * 0.1
    ada_in = jax.random.normal(jax.random.PRNGKey(2),
                               (B, TINY.hidden_size), jnp.bfloat16)
    mp = jnp.tile(jnp.array([[[0, L]]], jnp.int32), (B, 1, 1))

    slow = dit_forward(TINY, params, h, ada_in, None, mp)
    fast = dit_forward(TINY, params, h, ada_in, None, mp, full_span=True)
    np.testing.assert_array_equal(np.asarray(slow), np.asarray(fast))

    fp = init_final_layer_params(TINY.hidden_size, 2, 3, jax.random.PRNGKey(3),
                                 jnp.bfloat16)
    fp["adaln"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(4), fp["adaln"]["kernel"].shape
    ).astype(jnp.bfloat16) * 0.1
    fp["linear"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(5), fp["linear"]["kernel"].shape
    ).astype(jnp.bfloat16) * 0.1
    s = final_layer_apply(fp, h, ada_in, mp)
    f = final_layer_apply(fp, h, ada_in, mp, full_span=True)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(f))
