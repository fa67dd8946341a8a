"""Fused decode-layer megakernel (ops/fused_decode.py) parity tests.

Token-exact against the maskgit golden fixtures: the full prefix-cached
MaskGIT loop with attn=pallas_fused must reproduce the reference tokens
(same fixtures as the dense and pallas paths), and the kernel itself must
match the dense layer math on random inputs.
"""

import os
from unittest import mock

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import fuse_parallel_mlp
from showo_tpu.models.showo import showo_t2i_generate_cached
from showo_tpu.ops import flash_attention as fa
from showo_tpu.ops import fused_decode as fd
from showo_tpu.utils.torch_import import phi_params_from_torch
from tests.test_maskgit import CFG, GOLDEN


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_maskgit.py")
    return np.load(GOLDEN)


def test_fused_decode_token_exact(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = {"showo": jax.tree.map(jnp.asarray,
                                    phi_params_from_torch(sd, num_layers=2))}
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    bias = jnp.where(jnp.asarray(golden["bias"]) < 0, -1e9,
                     0.0).astype(jnp.float32)

    orig_full = fa.omni_attention
    orig_fused = fd.fused_decode_attention

    def interp_full(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        return orig_full(*args, **kw)

    def interp_fused(*args, **kw):
        kw["interpret"] = True
        return orig_fused(*args, **kw)

    with mock.patch.object(fa, "omni_attention", interp_full), \
         mock.patch.object(fd, "fused_decode_attention", interp_fused):
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
            use_pallas_attention="pallas_fused",
            pad_id=99, soi_id=101, eoi_id=102,
        )
    np.testing.assert_array_equal(np.asarray(tokens), golden["tokens"])


def test_kernel_matches_dense_layer_math():
    """fused_decode_attention == qk-LN + rope + concat + masked attention
    composed from the plain jnp ops, on random fp32 inputs."""
    from showo_tpu.models.phi import (_rope_tables, apply_rope, layer_norm)

    B, S, P, H, Dh = 2, 6, 4, 4, 8
    hidden = H * Dh
    rd = Dh // 2
    L = P + S
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(B, S, 4 * hidden)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(B, P, hidden)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(B, P, hidden)), jnp.float32)
    q_ln = {"scale": jnp.asarray(rng.normal(size=(Dh,)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(Dh,)), jnp.float32)}
    k_ln = {"scale": jnp.asarray(rng.normal(size=(Dh,)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(Dh,)), jnp.float32)}
    # irregular mask metadata: an image span + pads
    seg = jnp.asarray(rng.integers(0, 3, size=(B, L)), jnp.int32)
    pad = jnp.asarray(rng.integers(0, 2, size=(B, L)), jnp.int32)
    last_pad = jnp.asarray([3, 100], jnp.int32)
    prefix = jnp.asarray([0, 2], jnp.int32)
    q_pos = P + jnp.arange(S)
    positions = q_pos[None, :]
    cos, sin = _rope_tables(positions, rd, 10000.0)

    got = fd.fused_decode_attention(
        y, ck, cv, q_ln, k_ln, cos[0], sin[0], seg, pad, last_pad, prefix,
        q_pos, hidden=hidden, num_heads=H, rotary_dim=rd, eps=1e-5,
        interpret=True)

    # dense composition
    q = y[..., :hidden].reshape(B, S, H, Dh)
    kf = y[..., hidden:2 * hidden].reshape(B, S, H, Dh)
    vf = y[..., 2 * hidden:3 * hidden]
    q = layer_norm(q, q_ln["scale"], q_ln["bias"], 1e-5)
    kf = layer_norm(kf, k_ln["scale"], k_ln["bias"], 1e-5)
    q, kf = apply_rope(q, kf, cos, sin, rd)
    k = jnp.concatenate([ck.reshape(B, P, H, Dh), kf], axis=1)
    v = jnp.concatenate([cv, vf], axis=1).reshape(B, L, H, Dh)
    pos_k = jnp.arange(L)
    vis = pos_k[None, None, :] <= q_pos[None, :, None]
    seg_q = jnp.take_along_axis(seg, q_pos[None, :].repeat(B, 0), axis=1)
    vis = vis | ((seg_q[:, :, None] == seg[:, None, :])
                 & (seg_q[:, :, None] > 0))
    vis = vis | (pos_k[None, None, :] < prefix[:, None, None])
    vis = vis & ((jnp.take_along_axis(
        pad, pos_k[None, :].repeat(B, 0), axis=1)[:, None, :] == 0)
        | (q_pos[None, :, None] <= last_pad[:, None, None]))
    bias = jnp.where(vis, 0.0, fd.NEG_INF)[:, None, :, :]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(Dh)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    want = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, hidden)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
