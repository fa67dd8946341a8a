"""Ring attention (KV sharded over the mesh sequence axis) vs the dense
reference — the SURVEY §5.7 long-context completion: S=32k video
sequences sharded over 8 devices (virtual CPU mesh here; ICI on real
hardware)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from showo_tpu.ops.ring_attention import (ring_omni_attention_sharded,
                                          NEG_INF)


def _mesh(n=8, name="sp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def _predicate_bias(seg, pad, last_pad, prefix):
    """Dense additive bias from the O(S) span metadata (the predicate
    flash/streaming/ring all implement)."""
    B, S = seg.shape
    i = np.arange(S)[:, None]
    j = np.arange(S)[None, :]
    vis = np.broadcast_to(j <= i, (B, S, S)).copy()
    vis |= (np.asarray(seg)[:, :, None] == np.asarray(seg)[:, None, :]) \
        & (np.asarray(seg)[:, :, None] > 0)
    vis |= j[None] < np.asarray(prefix)[:, None, None]
    keep = (np.asarray(pad)[:, None, :] == 0) \
        | (i[None] <= np.asarray(last_pad)[:, None, None])
    return jnp.asarray(np.where(vis & keep, 0.0, NEG_INF))[:, None]


def _dense(q, k, v, bias):
    H, Hkv = q.shape[1], k.shape[1]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1]) + bias
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)


def test_ring_parity_vs_dense_8dev():
    """Segments + pad + prefix, GQA, 8-way ring at S=1024."""
    B, H, Hkv, S, D = 2, 4, 2, 1024, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[0, 100:400] = 1          # bidirectional image span
    seg[1, 500:900] = 2
    seg = jnp.asarray(seg)
    pad = np.zeros((B, S), np.int32)
    pad[0, :16] = 1              # left padding
    pad = jnp.asarray(pad)
    last_pad = jnp.asarray([15, -1], jnp.int32)
    prefix = jnp.asarray([0, 64], jnp.int32)

    want = _dense(q, k, v, _predicate_bias(seg, pad, last_pad, prefix))
    with _mesh() as mesh:
        got = jax.jit(lambda *a: ring_omni_attention_sharded(mesh, *a))(
            q, k, v, seg, pad, last_pad, prefix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ring_parity_single_device_degenerate():
    """1-device mesh == plain attention (no rotation)."""
    B, H, S, D = 1, 2, 256, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    seg = jnp.zeros((B, S), jnp.int32)
    want = _dense(q, k, v, _predicate_bias(
        seg, jnp.zeros((B, S), jnp.int32), jnp.asarray([-1]),
        jnp.asarray([0])))
    with _mesh(1) as mesh:
        got = ring_omni_attention_sharded(mesh, q, k, v, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_ring_32k_spot_rows():
    """S=32768 over 8 devices — the sequence one chip's HBM can't hold
    as dense scores.  Exactness spot-checked on sampled rows against a
    directly computed softmax over the full 32k keys (O(rows * S), so
    the test stays cheap)."""
    B, H, S, D = 1, 2, 32768, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[0, 1000:9000] = 1        # an 8k video span crossing shard bounds
    seg[0, 20000:30000] = 3
    seg = jnp.asarray(seg)

    with _mesh() as mesh:
        out = jax.jit(lambda *a: ring_omni_attention_sharded(mesh, *a))(
            q, k, v, seg)
    out = np.asarray(out)
    assert out.shape == (B, H, S, D) and np.isfinite(out).all()

    segn = np.asarray(seg)
    for row in (0, 777, 4096 - 1, 8191, 25000, S - 1):
        vis = (np.arange(S) <= row) | ((segn[0] == segn[0, row])
                                       & (segn[0, row] > 0))
        s = np.einsum("hd,hsd->hs", np.asarray(q)[0, :, row],
                      np.asarray(k)[0]) / np.sqrt(D)           # [H, S]
        s = np.where(vis[None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("hs,hsd->hd", p, np.asarray(v)[0])   # [H, D]
        np.testing.assert_allclose(out[0, :, row], want, atol=3e-5,
                                   rtol=1e-4, err_msg=f"row {row}")
