"""Dense layer op. Kernel layout (in, out); fp32 MXU accumulation."""

from __future__ import annotations

import jax.numpy as jnp


def linear(x, w, b=None, accum_dtype=jnp.float32):
    y = jnp.matmul(x, w.astype(x.dtype), preferred_element_type=accum_dtype)
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)
