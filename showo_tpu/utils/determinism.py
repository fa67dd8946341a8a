"""Determinism helpers (models/training_utils.py:27-58 analogue).

JAX programs are deterministic given fixed PRNG keys and deterministic
XLA reductions; this module centralizes run seeding (python/numpy/jax)
and the XLA flag for bit-reproducible GPU-style reductions (no-op on
TPU, where reductions are already deterministic).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int):
    """Seed python/numpy and return a jax PRNG key."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def enable_full_determinism(seed: int):
    """Maximal determinism: seeding + deterministic-ops env (set before
    backend init to take effect)."""
    os.environ.setdefault("XLA_FLAGS",
                          os.environ.get("XLA_FLAGS", "")
                          + " --xla_gpu_deterministic_ops=true")
    os.environ["TF_CUDNN_DETERMINISTIC"] = "1"
    return set_seed(seed)
