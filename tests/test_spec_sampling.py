"""Rejection-resampling speculative decoding: distribution exactness.

The sampling verify rule (serving/speculative.py::make_verify_sample)
must emit tokens from EXACTLY the filtered softmax that plain AR
sampling (sampling/ar.py::_sample_logits) draws from — speculative
decoding is pure acceleration, never a distribution change (Leviathan
et al. 2023, specialized to the point-mass drafts prompt-lookup
produces).  These tests check the marginals empirically and the greedy
(top_k=1) special case exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.sampling.ar import top_p_filter
from showo_tpu.serving.speculative import make_verify_sample, verify_greedy

V, K = 8, 2


def _filtered_probs(logits, temperature, top_k, top_p):
    flog = logits / temperature
    if top_k is not None:
        kth = jax.lax.top_k(flog, top_k)[0][..., -1:]
        flog = jnp.where(flog < kth, -jnp.inf, flog)
    if top_p is not None and top_p < 1.0:
        flog = top_p_filter(flog, top_p)
    return np.asarray(jax.nn.softmax(flog, axis=-1))


def _run_trials(verify, logits, draft, n=30000, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    out, m = jax.jit(jax.vmap(lambda k: verify(k, logits, draft)))(keys)
    return np.asarray(out), np.asarray(m)


@pytest.mark.parametrize("temperature,top_k,top_p", [
    (0.7, 4, None),
    (1.0, None, 0.85),
])
def test_first_token_marginal(temperature, top_k, top_p):
    """The first emitted token (accepted draft or residual resample) is a
    sample from the position-0 filtered softmax."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, K + 1, V)) * 2.0)
    p = _filtered_probs(logits, temperature, top_k, top_p)[0, 0]
    # draft a mid-probability token so both accept and reject paths run
    draft_tok = int(np.argsort(-p)[1])
    draft = jnp.asarray([[draft_tok, 0]], jnp.int32)

    verify = make_verify_sample(temperature, top_k, top_p)
    out, _ = _run_trials(verify, logits, draft)
    emp = np.bincount(out[:, 0, 0], minlength=V) / out.shape[0]
    np.testing.assert_allclose(emp, p, atol=0.02)


def test_second_token_marginal_given_first_accepted():
    """Conditioned on the first draft token surviving, the second emitted
    token is a sample from the position-1 filtered softmax (acceptance of
    position 0 depends only on u_0, independent of later randomness)."""
    temperature, top_k = 0.8, 5
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, K + 1, V)) * 2.0)
    p = _filtered_probs(logits, temperature, top_k, None)
    d0 = int(np.argmax(p[0, 0]))          # high acceptance at position 0
    d1 = int(np.argsort(-p[0, 1])[1])
    draft = jnp.asarray([[d0, d1]], jnp.int32)

    verify = make_verify_sample(temperature, top_k, None)
    out, m = _run_trials(verify, logits, draft, n=60000, seed=2)
    sel = m[:, 0] >= 1
    assert sel.mean() > 0.2
    emp = np.bincount(out[sel, 0, 1], minlength=V) / sel.sum()
    np.testing.assert_allclose(emp, p[0, 1], atol=0.02)


def test_filtered_out_draft_always_rejected():
    """A drafted token outside the top-k filter has p == 0: it must never
    be accepted, and the resample must come from the filtered support."""
    temperature, top_k = 1.0, 3
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, K + 1, V)) * 2.0)
    p = _filtered_probs(logits, temperature, top_k, None)[0, 0]
    worst = int(np.argmin(p + (p > 0)))   # a token with p == 0
    assert p[worst] == 0.0
    draft = jnp.asarray([[worst, 0]], jnp.int32)

    verify = make_verify_sample(temperature, top_k, None)
    out, m = _run_trials(verify, logits, draft, n=2000, seed=4)
    assert (m[:, 0] == 0).all()
    assert (out[:, 0, 0] != worst).all()
    assert (p[out[:, 0, 0]] > 0).all()


def test_topk1_reduces_to_greedy_verify():
    """With top_k=1 the filtered distribution is a point mass at the
    argmax, so rejection resampling must reproduce the greedy verify
    exactly (same accepted count, same emitted tokens)."""
    rng = np.random.default_rng(5)
    slots, k = 3, 3
    logits = jnp.asarray(rng.normal(size=(slots, k + 1, V)) * 2.0)
    amax = np.asarray(jnp.argmax(logits, -1))
    draft = amax[:, :k].copy()
    draft[0, 1] = (draft[0, 1] + 1) % V   # force a rejection mid-window
    draft[2, 0] = (draft[2, 0] + 1) % V   # force a rejection at position 0
    draft = jnp.asarray(draft, jnp.int32)

    verify = make_verify_sample(1.0, 1, None)
    out_s, m_s = jax.jit(verify)(jax.random.PRNGKey(6), logits, draft)
    out_g, m_g = verify_greedy(None, logits, draft)
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_g))
    for s in range(slots):
        n = int(m_g[s]) + 1
        np.testing.assert_array_equal(np.asarray(out_s)[s, :n],
                                      np.asarray(out_g)[s, :n])


def test_engine_speculative_sampling_e2e():
    """The serving engine runs speculative decoding under temperature
    sampling end-to-end: budgets are honored and every emitted token is a
    real vocab id (the residual resample can never emit the -1 ring
    sentinel or an out-of-vocab index)."""
    from showo_tpu.serving import ShowoMMUServer
    from tests.test_serving import CFG, _prompt

    from showo_tpu.models.showo import init_showo_params

    params = jax.jit(lambda kk: init_showo_params(CFG, kk, jnp.float32))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                            buckets=(24,), temperature=0.9, top_k=5,
                            speculative_k=2, lookahead=2)
    handles = [server.submit(_prompt(rng, q), b)
               for q, b in [(3, 5), (6, 8), (4, 6)]]
    done = server.run(jax.random.PRNGKey(8))
    assert len(done) == 3
    for h in handles:
        assert h.done and len(h.tokens) == h.max_new_tokens
        assert all(0 <= t < CFG.vocab_size for t in h.tokens)
