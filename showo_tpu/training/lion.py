"""Lion optimizer (training/optimizer.py:1-81), as an optax transform.

update = sign(beta1 * m + (1-beta1) * g);  p -= lr * (update + wd * p);
m = beta2 * m + (1-beta2) * g.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LionState(NamedTuple):
    momentum: optax.Updates


def lion(learning_rate, b1: float = 0.9, b2: float = 0.99,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    def init_fn(params):
        return LionState(jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        lr = learning_rate if not callable(learning_rate) else None
        upd = jax.tree.map(
            lambda g, m: jnp.sign(b1 * m + (1 - b1) * g), updates,
            state.momentum)
        if weight_decay and params is not None:
            upd = jax.tree.map(lambda u, p: u + weight_decay * p, upd, params)
        new_m = jax.tree.map(lambda g, m: b2 * m + (1 - b2) * g, updates,
                             state.momentum)
        if callable(learning_rate):
            # wrap with optax scale_by_schedule semantics externally
            raise ValueError("wrap lion() with optax.scale_by_schedule for "
                             "schedules; pass a float here")
        upd = jax.tree.map(lambda u: -lr * u, upd)
        return upd, LionState(new_m)

    return optax.GradientTransformation(init_fn, update_fn)
