"""int8 KV cache serving mode (serving/decode_chunk.py helpers).

Beyond-parity feature: the serving KV cache is stored as (int8 data,
f32 per-row-per-head absmax scales).  Dequantization never materializes
— K scales fold into the scores after the q x k_int8 dot, V scales into
the probs before the pr x v_int8 dot — so the cache streams from HBM at
half the bf16 traffic (decode is cache-bandwidth bound at long context).

Invariants tested:
  * quantize round-trip is exact on exactly-representable rows;
  * speculative decoding stays TOKEN-EXACT vs plain decode when BOTH use
    the int8 cache (speculation exactness is independent of cache
    precision);
  * int8-cache greedy output stays near-exact vs the full-precision
    standalone decode (quantization noise only).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.serving import Showo2MMUServer, ShowoMMUServer
from showo_tpu.serving.decode_chunk import (kv_cache_write, kv_cache_zeros,
                                            kv_quantize)
from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
from showo_tpu.show_o2.siglip import SigLipConfig

from tests.test_serving import (CFG, _prompt, _reference, _reference_v2,
                                _v2_prompt, params, params_v2)  # noqa: F401
from tests.test_serving import V2


def test_kv_quantize_roundtrip_exact():
    # rows whose entries are exact multiples of absmax/127 round-trip
    base = jnp.arange(-127, 127, 2, dtype=jnp.float32)[:64].reshape(1, 1, 64)
    x = jnp.stack([base * 0.01, base * 3.0], axis=2)   # [1,1,2,64] h=2
    q, s = kv_quantize(x)
    deq = q.astype(jnp.float32) * s[..., None]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(x),
                               rtol=1e-6, atol=1e-8)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]


def test_kv_cache_write_pair_matches_dense():
    shape = (2, 3, 8, 2, 4)                   # [L, slots, cap, h, Dh]
    dense = kv_cache_zeros(shape, False, jnp.float32)
    pair = kv_cache_zeros(shape, True, jnp.float32)
    assert isinstance(pair, tuple) and pair[0].shape == shape
    assert pair[1].shape == shape[:-1]
    rows = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 5, 2, 4))
    dense = kv_cache_write(dense, rows, (0, 1, 0, 0))
    pair = kv_cache_write(pair, rows, (0, 1, 0, 0))
    deq = pair[0].astype(jnp.float32) * pair[1][..., None]
    # absmax/127 quantization: error <= scale/2 ~ rowmax/254
    atol = float(jnp.max(jnp.abs(rows))) / 200.0
    np.testing.assert_allclose(np.asarray(deq), np.asarray(dense),
                               atol=atol)


def test_v1_kv_int8_near_exact_and_spec_token_exact(params):  # noqa: F811
    """Plain vs speculative decode under the SAME int8 cache must be
    token-exact; and int8-cache output stays near the full-precision
    reference (pure quantization noise at fp32 tiny dims)."""
    rng = np.random.default_rng(41)
    reqs = []
    for q_len, b in [(5, 8), (3, 11), (7, 6), (4, 9)]:
        p = _prompt(rng, q_len)
        p[-q_len:] = np.tile(p[-q_len:][:2], q_len // 2 + 1)[:q_len]
        reqs.append((p, b))

    outs = {}
    for spec in (0, 2):
        server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                                buckets=(16, 24), temperature=1.0, top_k=1,
                                speculative_k=spec, kv_int8=True)
        handles = [server.submit(p, b) for p, b in reqs]
        server.run(jax.random.PRNGKey(43))
        assert all(h.done and len(h.tokens) == b
                   for h, (_, b) in zip(handles, reqs))
        outs[spec] = [h.tokens for h in handles]
    assert outs[0] == outs[2], "speculation must be exact given the cache"

    ref = [_reference(params, p, b) for p, b in reqs]
    total = sum(len(t) for t in ref)
    agree = sum(int(a == b) for ts, rs in zip(outs[0], ref)
                for a, b in zip(ts, rs))
    assert agree / total >= 0.75, (agree, total, outs[0], ref)


def test_v2_kv_int8_near_exact_and_spec_token_exact(params_v2):  # noqa: F811
    rng = np.random.default_rng(47)
    reqs = [(_v2_prompt(rng, t)[0], 3, b, list(rng.integers(2, 190, size=t)))
            for t, b in [(4, 9), (6, 7), (3, 11)]]

    outs = {}
    for spec in (0, 2):
        server = Showo2MMUServer(V2, params_v2, slots=2, cap=72, chunk=3,
                                 buckets=(20, 28), temperature=1.0, top_k=1,
                                 speculative_k=spec, kv_int8=True)
        handles = [server.submit(e, s, b,
                                 **({"lookup_ids": ids} if spec else {}))
                   for e, s, b, ids in reqs]
        server.run(jax.random.PRNGKey(53))
        assert all(h.done and len(h.tokens) == b
                   for h, (_, _, b, _) in zip(handles, reqs))
        outs[spec] = [h.tokens for h in handles]
    assert outs[0] == outs[2]

    ref = [_reference_v2(params_v2, e, s, b) for e, s, b, _ in reqs]
    total = sum(len(t) for t in ref)
    agree = sum(int(a == b) for ts, rs in zip(outs[0], ref)
                for a, b in zip(ts, rs))
    assert agree / total >= 0.75, (agree, total)


def test_kv_int8_rejects_fused_admit(params):  # noqa: F811
    with pytest.raises(ValueError):
        ShowoMMUServer(CFG, params, slots=2, cap=48, chunk=3,
                       buckets=(16,), kv_int8=True, fused_admit=True)
