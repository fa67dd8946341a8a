"""EMA of model parameters (models/training_utils.py:61-296 ``EMAModel``),
as a pure pytree transform with the reference's decay warmup schedule."""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.9999
    min_decay: float = 0.0
    update_after_step: int = 0
    use_ema_warmup: bool = False
    inv_gamma: float = 1.0
    power: float = 2 / 3


class EMAState(NamedTuple):
    params: Any
    step: jnp.ndarray


def ema_init(params) -> EMAState:
    # an independent COPY: jnp.asarray would alias the live param buffers,
    # which breaks donation of the EMA state
    return EMAState(jax.tree.map(lambda x: jnp.copy(jnp.asarray(x)), params),
                    jnp.zeros((), jnp.int32))


def ema_decay(cfg: EMAConfig, optimization_step):
    """training_utils.py:139-157 ``get_decay``."""
    step = jnp.maximum(optimization_step - cfg.update_after_step - 1, 0)
    if cfg.use_ema_warmup:
        decay = 1.0 - (1.0 + step / cfg.inv_gamma) ** -cfg.power
    else:
        decay = (1.0 + step) / (10.0 + step)
    decay = jnp.minimum(decay, cfg.decay)
    decay = jnp.maximum(decay, cfg.min_decay)
    return jnp.where(step <= 0, 0.0, decay)


def ema_update(cfg: EMAConfig, state: EMAState, new_params) -> EMAState:
    step = state.step + 1
    d = ema_decay(cfg, step)
    upd = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p),
                       state.params, new_params)
    return EMAState(upd, step)
