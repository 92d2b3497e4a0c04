"""Small utilities (utils/misc.py:~1–100 approx. equivalent)."""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

# name → dtype map (torch_dtypes equivalent)
dtypes = {
    "float32": jnp.float32,
    "float": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "half": jnp.bfloat16,   # TPU-native half
    "float16": jnp.float16,
    "int32": jnp.int32,
    "int64": jnp.int64,
    "uint8": jnp.uint8,
}


def set_global_seeds(seed: int):
    """Seed python/numpy; returns a JAX PRNG key (JAX itself is
    functional — the key is the seed)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def onehot(target, num_classes, dtype=jnp.float32):
    return jax.nn.one_hot(target, num_classes, dtype=dtype)
