"""Chunk-local (fresh-KV) speculative decode == naive speculative decode.

The chunk-local program (speculative.py::_make_spec_decode_chunk_local +
decode_chunk.py window forwards) restructures the memory traffic only:
the big cache becomes loop-invariant across the chunk's steps, window
K/V rows accumulate in a side buffer and scatter once per chunk.  The
logit set each window row sees is identical to the naive program
(cache cols < lens0 from the big cache, positions lens0..lens+r from
the fresh buffer), so greedy token streams must match exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.serving import Showo2MMUServer, ShowoMMUServer
from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
from showo_tpu.show_o2.siglip import SigLipConfig

CFG = ShowoConfig(
    vocab_size=120, llm_vocab_size=100, num_new_special_tokens=3,
    codebook_size=16, num_vq_tokens=9,
    llm=PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=128),
)
SOI, EOI, MMU = 101, 102, 105


def _prompt(rng, q_len):
    img = rng.integers(106, 120, size=9)
    q = rng.integers(2, 99, size=q_len)
    return np.concatenate([[MMU, SOI], img, [EOI], q]).astype(np.int32)


def _run_v1(params, reqs, chunk_local):
    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1,
                            speculative_k=2, spec_chunk_local=chunk_local)
    handles = [server.submit(p, b) for p, b in reqs]
    server.run(jax.random.PRNGKey(11))
    return [h.tokens for h in handles]


def test_v1_spec_chunk_local_matches_naive():
    params = jax.jit(lambda k: init_showo_params(CFG, k, jnp.float32))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(3, 5), (7, 9), (2, 4), (10, 7), (5, 11)]]
    local = _run_v1(params, reqs, True)
    naive = _run_v1(params, reqs, False)
    assert local == naive


V2CFG = Showo2Config(
    llm=Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=9),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=4, image_latent_height=6, image_latent_width=6,
    patch_size=2, clip_latent_dim=48,
)


def _run_v2(params, reqs, chunk_local):
    server = Showo2MMUServer(V2CFG, params, slots=2, cap=96, chunk=3,
                             buckets=(32, 48), temperature=1.0, top_k=1,
                             speculative_k=2, spec_chunk_local=chunk_local)
    handles = [server.submit(emb, start, b, lookup_ids=ids)
               for emb, start, b, ids in reqs]
    server.run(jax.random.PRNGKey(5))
    return [h.tokens for h in handles]


def test_v2_spec_chunk_local_matches_naive():
    params = jax.jit(lambda k: init_showo2_params(V2CFG, k, jnp.float32))(
        jax.random.PRNGKey(1))
    D = V2CFG.llm.hidden_size
    rng = np.random.default_rng(9)
    reqs = []
    for i, (s_len, b) in enumerate([(20, 6), (30, 9), (25, 5), (18, 8)]):
        emb = np.asarray(jax.random.normal(jax.random.PRNGKey(20 + i),
                                           (s_len, D), jnp.float32))
        ids = rng.integers(2, 150, size=s_len).astype(np.int32)
        reqs.append((emb, 4, b, ids))
    local = _run_v2(params, reqs, True)
    naive = _run_v2(params, reqs, False)
    assert local == naive


def test_v2_spec_fused_admission_matches_plain_greedy():
    """v2 analog of the v1 test below: speculative serving with fused
    admissions (lookup_row threaded through the fused step's meta as
    (img_start, lookup_row)) must stay token-exact vs the same requests
    decoded without speculation or fused admission."""
    params = jax.jit(lambda k: init_showo2_params(V2CFG, k, jnp.float32))(
        jax.random.PRNGKey(1))
    D = V2CFG.llm.hidden_size
    rng = np.random.default_rng(41)
    reqs = []
    for i, (s_len, b) in enumerate([(20, 7), (28, 5), (24, 9), (18, 6)]):
        emb = np.asarray(jax.random.normal(jax.random.PRNGKey(60 + i),
                                           (s_len, D), jnp.float32))
        ids = rng.integers(2, 150, size=s_len).astype(np.int32)
        reqs.append((emb, 4, b, ids))

    def run(spec_k, fused):
        server = Showo2MMUServer(
            V2CFG, params, slots=2, cap=96, chunk=3, buckets=(32, 48),
            temperature=1.0, top_k=1, speculative_k=spec_k,
            fused_admit=fused)
        if fused:
            assert server.engine._fused_admit_for is not None
        handles = [server.submit(emb, start, b, lookup_ids=ids)
                   for emb, start, b, ids in reqs]
        server.run(jax.random.PRNGKey(35))
        if fused:
            assert server.engine._fused_cache, \
                "fused admission path was never exercised"
        return [h.tokens for h in handles]

    assert run(2, True) == run(0, False)


def test_v1_spec_fused_admission_matches_plain_greedy():
    """Speculative serving with fused admissions (admissions ride a plain
    fused decode step; spec_buf_update records it in the draft ring) must
    stay token-exact vs per-request greedy decode."""
    from showo_tpu.models.phi import fuse_parallel_mlp
    from showo_tpu.models.showo import showo_mmu_generate
    from showo_tpu.ops.masks import omni_mask_mmu

    params = jax.jit(lambda k: init_showo_params(CFG, k, jnp.float32))(
        jax.random.PRNGKey(0))
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    rng = np.random.default_rng(17)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(3, 6), (8, 9), (2, 5), (9, 7), (6, 10)]]

    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1,
                            speculative_k=2, fused_admit=True)
    assert server.engine._fused_admit_for is not None
    handles = [server.submit(p, b) for p, b in reqs]
    server.run(jax.random.PRNGKey(23))

    for h, (prompt, budget) in zip(handles, reqs):
        bias = omni_mask_mmu(jnp.asarray(prompt)[None], eoi_id=EOI,
                             dtype=jnp.float32)
        toks, _ = showo_mmu_generate(
            CFG, params, jnp.asarray(prompt)[None], jax.random.PRNGKey(7),
            prompt_bias=bias, max_new_tokens=budget, temperature=1.0,
            top_k=1)
        assert h.tokens == list(np.asarray(toks)[0]), \
            f"request {h.uid} diverged under fused admission"
