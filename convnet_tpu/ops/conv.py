"""2-D convolution ops, TPU-native layout.

Layout decisions (SURVEY.md §7 step 2):
- Activations are **NHWC** (batch, height, width, channels) — channels on
  the TPU lane dimension so XLA can tile convs straight onto the MXU.
- Kernels are **HWIO** (kh, kw, in_ch/groups, out_ch).
- Accumulation is float32 (``preferred_element_type``) even under bf16
  compute, matching MXU native behavior.

Replaces the reference's use of ``torch.nn.Conv2d``/cuDNN
(models/*.py throughout; SURVEY.md §2.1 row 1). Depthwise convolution is
expressed via ``feature_group_count`` and later gets a dedicated Pallas
kernel (ops/pallas/).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
from jax import lax

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def _resolve_padding(padding, kernel, dilation):
    """torch-style int padding → explicit ((lo,hi),(lo,hi)); accepts
    'SAME'/'VALID' strings and explicit ((lo,hi),(lo,hi)) (used by the
    asymmetric-padding space-to-depth stem)."""
    if isinstance(padding, str):
        return padding
    if (isinstance(padding, (tuple, list)) and padding
            and isinstance(padding[0], (tuple, list))):
        return tuple(tuple(p) for p in padding)
    ph, pw = _pair(padding)
    return ((ph, ph), (pw, pw))


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, str, Sequence[int]] = 0,
    dilation: Union[int, Sequence[int]] = 1,
    groups: int = 1,
) -> jax.Array:
    """NHWC conv. Output dtype == x.dtype.

    No explicit ``preferred_element_type``: the TPU MXU accumulates
    bf16×bf16 products in fp32 internally regardless, and passing an
    accumulation dtype different from the input dtype breaks the conv
    transpose rule on the axon backend (verified 2026-08-16).
    """
    kh, kw = w.shape[0], w.shape[1]
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=_pair(stride),
        padding=_resolve_padding(padding, (kh, kw), _pair(dilation)),
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=DIMSPEC,
    )


def conv2d_transpose_output_shape(in_size, kernel, stride, padding):
    """Helper for shape bookkeeping in model builders."""
    k, s, p = kernel, stride, padding
    return (in_size + 2 * p - k) // s + 1
