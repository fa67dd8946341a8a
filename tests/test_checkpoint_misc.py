"""Checkpoint round-trip, EMA schedule, metrics helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.training.ema import EMAConfig, ema_init, ema_update
from showo_tpu.training.lion import lion
from showo_tpu.training.metrics import (
    masked_bucket_cross_entropy,
    soft_target_cross_entropy,
    token_entropy,
)
from showo_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    resume_latest,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    out = str(tmp_path / "run")
    save_checkpoint(state, out, 100, checkpoints_total_limit=2)
    save_checkpoint(jax.tree.map(lambda x: x + 1, state), out, 200,
                    checkpoints_total_limit=2)
    save_checkpoint(jax.tree.map(lambda x: x + 2, state), out, 300,
                    checkpoints_total_limit=2)
    # ring buffer pruned to 2
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert dirs == ["checkpoint-200", "checkpoint-300"]
    restored, step = resume_latest(out, state)
    assert step == 300
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3) + 2)


def test_ema_schedule():
    params = {"w": jnp.zeros(3)}
    st = ema_init(params)
    cfg = EMAConfig(decay=0.9)
    # first update copies (decay 0), later ones smooth toward the target
    st = ema_update(cfg, st, {"w": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(st.params["w"]), 1.0)
    for _ in range(4):
        st = ema_update(cfg, st, {"w": jnp.full((3,), 2.0)})
    val = np.asarray(st.params["w"])
    assert (val > 1).all() and (val < 2).all()
    # decay approaches but never exceeds cfg.decay
    from showo_tpu.training.ema import ema_decay

    assert abs(float(ema_decay(cfg, jnp.asarray(10000))) - 0.9) < 1e-6


def test_lion_step():
    opt = lion(1e-2, weight_decay=0.0)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    grads = {"w": jnp.asarray([0.5, -0.5, 0.0])}
    updates, state = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               [-1e-2, 1e-2, 0.0], atol=1e-9)


def test_soft_ce_and_buckets():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, size=(4, 8)))
    soft = jax.nn.one_hot(labels[:, 1:], 16)
    loss = soft_target_cross_entropy(logits, labels, soft)
    assert np.isfinite(float(loss))

    mask_prob = jnp.asarray([0.05, 0.45, 0.45, 0.95])
    ce, counts = masked_bucket_cross_entropy(logits, labels, mask_prob)
    assert counts.sum() == 4
    assert int(counts[4]) == 2  # two samples in the 0.4-0.5 bucket
    assert np.isfinite(float(token_entropy(logits)))
