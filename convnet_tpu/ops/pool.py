"""Pooling ops (NHWC), patch-decomposition formulation.

Replaces torch.nn.MaxPool2d/AvgPool2d/AdaptiveAvgPool2d used across the
reference model zoo (e.g. models/resnet.py:~240 approx.).

Implementation note: instead of ``lax.reduce_window`` (whose
reverse-mode path is unsupported on the axon TPU backend and whose VJP
— select-and-scatter — is slow on TPU anyway), each k×k window is
decomposed into k² strided slices combined elementwise. XLA fuses the
slice+max/add chains into one VPU loop, and the backward pass is plain
elementwise select/scatter-free math. Typical pools are 2×2/3×3, so
k² ≤ 9 terms.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _out_size(size, k, s, p):
    return (size + 2 * p - k) // s + 1


def _patches(x, kernel, stride, padding, pad_value):
    """Yield the k² strided views of the padded input, each of the
    output's spatial shape."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    h_out = _out_size(x.shape[1], kh, sh, ph)
    w_out = _out_size(x.shape[2], kw, sw, pw)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                    constant_values=pad_value)
    for i in range(kh):
        for j in range(kw):
            yield x[:, i:i + h_out * sh:sh, j:j + w_out * sw:sw, :]


def max_pool2d(x, kernel, stride=None, padding=0):
    stride = stride if stride is not None else kernel
    if jnp.issubdtype(x.dtype, jnp.floating):
        pad_value = -jnp.inf
    else:
        pad_value = jnp.iinfo(x.dtype).min
    out = None
    for patch in _patches(x, kernel, stride, padding, pad_value):
        out = patch if out is None else jnp.maximum(out, patch)
    return out


def avg_pool2d(x, kernel, stride=None, padding=0, count_include_pad=True):
    stride = stride if stride is not None else kernel
    kh, kw = _pair(kernel)
    acc = None
    for patch in _patches(x, kernel, stride, padding, 0):
        p32 = patch.astype(jnp.float32)
        acc = p32 if acc is None else acc + p32
    if count_include_pad or _pair(padding) == (0, 0):
        out = acc / (kh * kw)
    else:
        # per-position valid counts are shape-static: fold them at trace
        ones = np.ones((1,) + x.shape[1:3] + (1,), np.float32)
        counts = None
        ph, pw = _pair(padding)
        padded = np.pad(ones, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        sh, sw = _pair(stride)
        h_out = _out_size(x.shape[1], kh, sh, ph)
        w_out = _out_size(x.shape[2], kw, sw, pw)
        for i in range(kh):
            for j in range(kw):
                sl = padded[:, i:i + h_out * sh:sh, j:j + w_out * sw:sw, :]
                counts = sl if counts is None else counts + sl
        out = acc / jnp.asarray(counts)
    return out.astype(x.dtype)


def global_avg_pool(x, keepdims=False):
    """Adaptive-avg-pool-to-1x1 equivalent; fp32 accumulation."""
    out = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return out.astype(x.dtype)
