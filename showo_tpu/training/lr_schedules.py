"""LR schedules mirroring models/lr_schedulers.py (as optax schedules).

constant / constant_with_warmup / linear / cosine / cosine_with_restarts /
polynomial, same formulas as the reference LambdaLR multipliers applied to
a base learning rate.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def get_lr_schedule(
    name: str,
    base_lr: float,
    num_warmup_steps: int = 0,
    num_training_steps: int = 0,
    num_cycles: float = 0.5,
    power: float = 1.0,
    lr_end: float = 1e-7,
) -> Callable:
    w = max(1, num_warmup_steps)

    def warmup_frac(step):
        return jnp.minimum(step / w, 1.0)

    if name == "constant":
        return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)

    if name == "constant_with_warmup":
        return lambda step: base_lr * warmup_frac(step)

    if name == "linear":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            decay = jnp.clip(
                (num_training_steps - step)
                / max(1, num_training_steps - num_warmup_steps), 0.0, 1.0)
            return base_lr * jnp.where(step < num_warmup_steps,
                                       warmup_frac(step), decay)
        return fn

    if name == "cosine":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            # progress deliberately NOT clipped at 1: the reference LambdaLR
            # keeps evaluating the cosine past num_training_steps
            # (lr_schedulers.py get_cosine_schedule_with_warmup)
            progress = ((step - num_warmup_steps)
                        / max(1, num_training_steps - num_warmup_steps))
            cos = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)))
            return base_lr * jnp.where(step < num_warmup_steps,
                                       warmup_frac(step), cos)
        return fn

    if name == "cosine_with_restarts":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            progress = jnp.clip(
                (step - num_warmup_steps)
                / max(1, num_training_steps - num_warmup_steps), 0.0, 1.0)
            cyc = (num_cycles * progress) % 1.0
            cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * cyc)))
            cos = jnp.where(progress >= 1.0, 0.0, cos)
            return base_lr * jnp.where(step < num_warmup_steps,
                                       warmup_frac(step), cos)
        return fn

    if name == "polynomial":
        def fn(step):
            step = jnp.asarray(step, jnp.float32)
            lr_range = base_lr - lr_end
            decay_steps = max(1, num_training_steps - num_warmup_steps)
            rem = jnp.clip(1 - (step - num_warmup_steps) / decay_steps, 0.0, 1.0)
            decayed = lr_range * rem ** power + lr_end
            out = jnp.where(step < num_warmup_steps,
                            base_lr * warmup_frac(step),
                            jnp.where(step > num_training_steps, lr_end, decayed))
            return out
        return fn

    raise ValueError(f"unknown schedule {name}")
