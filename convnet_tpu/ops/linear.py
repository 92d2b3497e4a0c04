"""Dense layer op. Kernel layout (in, out).

The TPU MXU accumulates bf16 matmuls in fp32 internally; an explicit
``preferred_element_type`` different from the operand dtype breaks the
transpose rule on the axon backend (see ops/conv.py), so the matmul
runs in the compute dtype and the bias add is done in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear(x, w, b=None):
    y = jnp.matmul(x, w.astype(x.dtype))
    if b is not None:
        y = (y.astype(jnp.float32) + b.astype(jnp.float32)).astype(y.dtype)
    return y
