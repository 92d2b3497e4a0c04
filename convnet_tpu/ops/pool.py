"""Pooling ops (NHWC) via XLA reduce_window.

Replaces torch.nn.MaxPool2d/AvgPool2d/AdaptiveAvgPool2d used across the
reference model zoo (e.g. models/resnet.py:~240 approx.).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _window_padding(padding):
    if isinstance(padding, str):
        return padding
    ph, pw = _pair(padding)
    return ((0, 0), (ph, ph), (pw, pw), (0, 0))


def max_pool2d(x, kernel, stride=None, padding=0):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        jnp.asarray(init, x.dtype),
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=_window_padding(padding),
    )


def avg_pool2d(x, kernel, stride=None, padding=0, count_include_pad=True):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        jnp.float32(0),
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=_window_padding(padding),
    )
    if count_include_pad or padding in (0, (0, 0)):
        out = summed / (kh * kw)
    else:
        ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
        counts = lax.reduce_window(
            ones, jnp.float32(0), lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=_window_padding(padding),
        )
        out = summed / counts
    return out.astype(x.dtype)


def global_avg_pool(x, keepdims=False):
    """Adaptive-avg-pool-to-1x1 equivalent; fp32 accumulation."""
    out = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return out.astype(x.dtype)
