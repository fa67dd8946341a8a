"""Continuous-batching serving engine: per-lane decode == per-request decode.

The engine batches REQUESTS AT DIFFERENT LENGTHS into one compiled decode
program (per-lane KV offsets).  Greedy decoding through the engine must
reproduce each request's standalone showo_mmu_generate output exactly —
slot packing, prompt padding, and chunked scheduling are pure scheduling,
not approximations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                    showo_mmu_generate)
from showo_tpu.ops.masks import omni_mask_mmu
from showo_tpu.serving import ShowoMMUServer

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


@pytest.fixture(scope="module")
def params():
    return jax.jit(lambda k: init_showo_params(CFG, k, jnp.float32))(
        jax.random.PRNGKey(0))


def _reference(params, prompt, budget):
    bias = omni_mask_mmu(jnp.asarray(prompt)[None], eoi_id=EOI,
                         dtype=jnp.float32)
    toks, _ = showo_mmu_generate(
        CFG, params, jnp.asarray(prompt)[None], jax.random.PRNGKey(7),
        prompt_bias=bias, max_new_tokens=budget, temperature=1.0, top_k=1)
    return list(np.asarray(toks)[0])


def test_engine_matches_per_request_greedy(params):
    rng = np.random.default_rng(3)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(3, 5), (7, 9), (2, 4), (10, 7), (5, 11), (4, 3)]]

    server = ShowoMMUServer(CFG, params, slots=2, cap=48, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1)
    handles = [server.submit(p, b) for p, b in reqs]
    done = server.run(jax.random.PRNGKey(11))

    assert len(done) == len(reqs)
    for h, (prompt, budget) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
        assert h.tokens == _reference(params, prompt, budget), \
            f"request {h.uid} diverged"


def test_engine_slot_reuse_and_accounting(params):
    rng = np.random.default_rng(5)
    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=4,
                            buckets=(24,), temperature=1.0, top_k=1)
    handles = [server.submit(_prompt(rng, 4), 6) for _ in range(5)]
    done = server.run(jax.random.PRNGKey(1))
    assert len(done) == 5
    for h in handles:
        assert len(h.tokens) == 6
        assert h.first_token_at is not None and h.finished_at is not None


def test_engine_eot_frees_slot(params):
    """A request hitting EOT finishes early; its slot serves the queue."""
    rng = np.random.default_rng(9)
    prompt = _prompt(rng, 4)
    # find the greedy continuation's second token and declare it EOT so the
    # engine must cut generation at 2 tokens while budget says 10
    ref = _reference(params, prompt, 3)
    eot = ref[1]
    server = ShowoMMUServer(CFG, params, slots=1, cap=64, chunk=4,
                            buckets=(24,), temperature=1.0, top_k=1,
                            eot_token=eot)
    h = server.submit(prompt, 10)
    h2 = server.submit(_prompt(rng, 5), 4)
    done = server.run(jax.random.PRNGKey(2))
    assert len(done) == 2
    assert h.done and h.tokens[-1] == eot and len(h.tokens) <= 4
    assert len(h2.tokens) == 4
