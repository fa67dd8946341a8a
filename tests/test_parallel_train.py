"""Multi-device training-step test on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.ops.masks import omni_mask_predict_next
from showo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from showo_tpu.training.train_step import (
    TrainConfig,
    init_train_state,
    make_jitted_train_step,
    make_optimizer,
)
from showo_tpu.training.corruption import mask_or_random_replace_tokens
from showo_tpu.sampling.schedules import cosine_schedule

CFG = ShowoConfig(
    vocab_size=128, llm_vocab_size=100, num_new_special_tokens=3,
    codebook_size=16, num_vq_tokens=8,
    llm=PhiConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4),
)


def _toy_batch(B, L):
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 90, size=(B, L))
    labels = np.where(rng.random((B, L)) < 0.5, ids, -100)
    bias = np.asarray(omni_mask_predict_next(
        jnp.asarray(ids), pad_id=99, soi_id=101, eoi_id=102))
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
            "bias": jnp.asarray(bias)}


def test_train_step_dp_fsdp_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2, fsdp=4)
    tc = TrainConfig(max_seq_length=4)
    params = init_showo_params(CFG, jax.random.PRNGKey(0))
    opt = make_optimizer(tc)

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        state = init_train_state(params, opt)
        step_fn = make_jitted_train_step(CFG, tc, opt, 4, 2, 2)
        batch = shard_batch(_toy_batch(8, 16), mesh)
        state, metrics = step_fn(state, batch)
        state, metrics = step_fn(state, batch)

    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 2


def test_fsdp_actually_shards():
    mesh = make_mesh(dp=2, fsdp=4)
    params = init_showo_params(CFG, jax.random.PRNGKey(0))
    sharded = shard_params(params, mesh)
    fc1 = sharded["showo"]["layers"]["fc1"]["kernel"]
    # [L=2, D=64, F=128] sharded over fsdp(4) on last axis
    shard_shapes = {tuple(s.data.shape) for s in fc1.addressable_shards}
    assert shard_shapes == {(2, 64, 32)}


def test_corruption():
    key = jax.random.PRNGKey(0)
    toks = jnp.arange(64).reshape(2, 32) % 16
    noised, labels, lw, p = mask_or_random_replace_tokens(
        key, toks, mask_id=127, mask_schedule=cosine_schedule,
        min_masking_rate=0.1)
    masked = noised == 127
    # masked positions carry the original token as label, others -100
    assert bool(jnp.all(jnp.where(masked, labels == toks, labels == -100)))
    assert masked.sum() >= 2  # at least one per row
    assert lw is None
