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


def enable_compile_cache(cache_dir: str):
    """Persistent XLA compilation cache: compiled executables are
    keyed by (HLO, compile options, backend) and reused across
    processes, so relaunches/resumes skip the 20–40 s TPU compile of
    the training step. Call before the first jit execution. Also
    honored via the ``CONVNET_TPU_COMPILE_CACHE`` env var (CLI default)
    — the deployment analog is warming ``serve.Predictor`` instantly
    after a restart."""
    import os
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default thresholds skip small/fast compiles; cache everything —
    # a resumed CLI run re-traces every jitted helper, not just the step
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def onehot(target, num_classes, dtype=jnp.float32):
    return jax.nn.one_hot(target, num_classes, dtype=dtype)
