"""Gradient accumulation: accum=k at B/k must match accum=1 at B.

Reference semantics (training/train.py:589 accelerator.accumulate;
show-o2/train_stage_one.py:453-471 manual `% grad_accum`): sum of
loss/k backwards == mean microbatch gradient, clipped and applied once.
Here: optax.MultiSteps wrapping, exercised through the v1 train_step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.training.train_step import (
    TrainConfig,
    init_train_state,
    make_jitted_train_step,
    make_optimizer,
)

V = 64


def tiny_cfg():
    return ShowoConfig(
        vocab_size=V + 17, llm_vocab_size=V, num_new_special_tokens=0,
        codebook_size=16, num_vq_tokens=8,
        llm=PhiConfig(vocab_size=V + 17, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=2))


def _batch(rng, n_per_task, L):
    B = 3 * n_per_task
    ids = jnp.asarray(rng.integers(2, V, size=(B, L)), jnp.int32)
    labels = jnp.asarray(rng.integers(2, V, size=(B, L)), jnp.int32)
    bias = jnp.zeros((B, 1, L, L), jnp.float32)
    return {"input_ids": ids, "labels": labels, "bias": bias}


def _micro(batch, k, n):
    """Microbatch k of n: rows [k, n+k, 2n+k] keep the [t2i|lm|mmu] layout."""
    rows = jnp.asarray([k, n + k, 2 * n + k])
    return {key: v[rows] for key, v in batch.items()}


def test_accum4_matches_full_batch():
    cfg = tiny_cfg()
    L, n = 16, 4
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(np.random.default_rng(0), n, L)

    # adam_eps=1e-3: at eps=1e-8 the g/sqrt(v) normalization amplifies
    # float-order noise on near-zero gradients (k_ln.bias) into a visible
    # param delta; the semantics under test (mean-grad accumulation) are
    # eps-independent.
    # full batch, accum=1
    tc1 = TrainConfig(learning_rate=1e-3, max_seq_length=4,
                      adam_eps=1e-3, grad_accum_steps=1)
    opt1 = make_optimizer(tc1)
    step1 = make_jitted_train_step(cfg, tc1, opt1, n, n, n, donate=False)
    s1, m1 = step1(init_train_state(params, opt1), batch)

    # 4 microbatches of B/4, accum=4
    tc4 = TrainConfig(learning_rate=1e-3, max_seq_length=4,
                      adam_eps=1e-3, grad_accum_steps=4)
    opt4 = make_optimizer(tc4)
    step4 = make_jitted_train_step(cfg, tc4, opt4, 1, 1, 1, donate=False)
    s4 = init_train_state(params, opt4)
    for k in range(4):
        prev = s4.params
        s4, m4 = step4(s4, _micro(batch, k, n))
        if k < 3:  # no update until the 4th microbatch
            same = jax.tree.map(
                lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
                prev, s4.params)
            assert all(jax.tree.leaves(same))

    # losses average to the full-batch loss (valid-label counts are equal
    # per microbatch, so mean-of-means == full mean)
    # and the applied update matches the single full-batch step
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_stage1_grad_accum_wiring():
    """Stage-1 optimizer with grad_accum fires every k calls and composes
    with parameter freezing."""
    import optax

    from showo_tpu.show_o2.train_stage_one import (
        Stage1Config,
        make_stage1_optimizer,
    )

    params = {"showo": {"w": jnp.ones((4,))},
              "frozen_thing": {"w": jnp.ones((4,))}}
    sc = Stage1Config(learning_rate=1e-2, grad_accum_steps=3)
    opt = make_stage1_optimizer(sc, params, frozen_substrings=("frozen",))
    state = opt.init(params)
    g = {"showo": {"w": jnp.ones((4,))},
         "frozen_thing": {"w": jnp.ones((4,))}}
    p = params
    for i in range(3):
        upd, state = opt.update(g, state, p)
        if i < 2:
            assert all(float(jnp.abs(x).max()) == 0.0
                       for x in jax.tree.leaves(upd))
        p = optax.apply_updates(p, upd)
    assert float(jnp.abs(p["showo"]["w"] - 1.0).max()) > 0  # updated
    np.testing.assert_array_equal(np.asarray(p["frozen_thing"]["w"]),
                                  np.ones(4))  # frozen stays put
