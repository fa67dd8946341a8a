"""Mask-ratio schedules for MaskGIT discrete diffusion.

Numerics match models/sampling.py:39-78 (cosine/linear/pow/sigmoid).
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp


def cosine_schedule(t):
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t):
    return jnp.clip(1.0 - t, 1e-6, 1.0)


def pow_schedule(t, exponent: float):
    return jnp.clip(1.0 - t ** exponent, 1e-6, 1.0)


def sigmoid_schedule(t, start=-3.0, end=3.0, tau=1.0, clip_min=1e-6):
    def sig(x):
        return 1.0 / (1.0 + jnp.exp(-x))

    v_start = sig(jnp.asarray(start / tau))
    v_end = sig(jnp.asarray(end / tau))
    out = sig((t * (end - start) + start) / tau)
    out = (v_end - out) / (v_end - v_start)
    return jnp.clip(out, clip_min, 1.0)


def get_mask_schedule(method: str, **kwargs):
    """models/sampling.py:68-78 ``get_mask_chedule`` (sic) dispatch."""
    if method == "cosine":
        return cosine_schedule
    if method == "linear":
        return linear_schedule
    if "pow" in method:
        return partial(pow_schedule, exponent=float(method.replace("pow", "")))
    if method == "sigmoid":
        return partial(sigmoid_schedule, **kwargs)
    raise ValueError(f"Unknown schedule method: {method}")
