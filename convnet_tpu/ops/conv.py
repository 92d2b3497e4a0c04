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

import os
from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NHWC", "HWIO", "NHWC")

# 1×1/stride-1 convs as reshape+dot (opt-in: CONVNET_TPU_1X1_DOT=1).
# A pointwise conv IS a matmul over flattened pixels; standalone the
# dot formulation's filter-gradient beats the conv engine's on v5e
# (3.90 → 2.49 ms fwd+bwd, 256→64 @56²) but at full-model scale XLA
# already canonicalizes in-graph 1×1 convs — RN50 measured identical
# 114.5 ms both ways (scripts/tpu_bench16_results.txt), so the
# canonical conv path stays default and this remains an escape hatch
# for backends without that canonicalization.
_DOT_1X1 = os.environ.get("CONVNET_TPU_1X1_DOT", "0") == "1"

# Grouped-conv lowering selection (ResNeXt; VERDICT r4 #2). XLA lowers
# feature_group_count=32 with the group dim as a stride-31 spatial dim
# and runs at ~25% of its own bytes floor (job 103). The "tiled dense"
# reformulation splits C into T=C/128 tiles and runs T independent
# dense 128->128 convs with block-diagonal-masked weights: every matmul
# is a dense 128-lane MXU op, at 128/cg x the grouped FLOPs (cg = C/g),
# still far below full dense (g x). Gradients are exact: the eye-mask
# in the dense-tile construction kills off-block wgrads (job 105
# parity, re-verified with dw in job 134).
#   CONVNET_TPU_GROUPED = auto (default: measured per-shape table) |
#                         fgc (always feature_group_count) |
#                         tiled (always tiled-dense)
_GROUPED_MODE = os.environ.get("CONVNET_TPU_GROUPED", "auto")

# Weight-gradients as explicit dot contractions (opt-in experiment:
# CONVNET_TPU_DOT_WGRAD=1). Profiling (scripts/tpu_profile_rn50, session
# 29c) attributes 56.6 of the RN50 step's 104.6 ms to conv wgrads —
# ~3x the forward's 18.0 ms at equal FLOPs — and XLA's own cost model
# concurs (137 Mcycles bwd vs 54 fwd). The wgrad contraction runs over
# batch*space; expressing it as [BHW,Cin]^T @ [BHW,Cout] per tap lets
# the dot emitter stream that reduction instead of the conv transpose
# emitter's window loop. Forward and data-grad stay on the native conv
# path (which profiling shows is efficient: dgrad 5.6 ms total).
_DOT_WGRAD = os.environ.get("CONVNET_TPU_DOT_WGRAD", "0") == "1"


def _grouped_dense_tiles(w: jax.Array, groups: int) -> jax.Array:
    """Grouped HWIO weight (kh,kw,cg,C) -> (T,kh,kw,128,128) dense
    tiles, block-diagonal within each tile (off-block entries zero, so
    the chain rule returns exact grouped wgrads)."""
    kh, kw, cg, C = w.shape
    T = C // 128
    gpt = 128 // cg
    wr = w.reshape(kh, kw, cg, T, gpt, cg)     # (h,w,ci,t,jo,co)
    wr = wr.transpose(3, 0, 1, 2, 4, 5)        # (t,h,w,ci,jo,co)
    eye = jnp.eye(gpt, dtype=w.dtype)          # (ji,jo)
    wd = (wr[:, :, :, None, :, :, :]
          * eye[None, None, None, :, None, :, None])
    return wd.reshape(T, kh, kw, 128, 128)


def _conv2d_grouped_tiled(x, w, stride, pad, groups):
    """Grouped conv as C/128 independent dense 128->128 convs (see
    _GROUPED_MODE note above)."""
    wd = _grouped_dense_tiles(w.astype(x.dtype), groups)
    T = wd.shape[0]
    ys = [
        lax.conv_general_dilated(
            lax.slice_in_dim(x, t * 128, (t + 1) * 128, axis=3), wd[t],
            window_strides=stride, padding=pad, dimension_numbers=DIMSPEC)
        for t in range(T)
    ]
    return jnp.concatenate(ys, axis=-1) if T > 1 else ys[0]


def _tiled_grouped_eligible(x_shape, w_shape, groups, dilation):
    """Structural eligibility for the tiled-dense lowering: true
    grouped (not depthwise, not dense), equal in/out channels, whole
    groups per 128-lane tile."""
    kh, kw, cg, cout = w_shape
    cin = x_shape[-1]
    return (groups > 1 and cg > 1 and cin == cout
            and cin % 128 == 0 and 128 % cg == 0
            and _pair(dilation) == (1, 1))


def _tiled_grouped_wins(h, c, cg, stride):
    """Measured dispatch table (v5e, jobs 105/134): shapes where the
    tiled-dense lowering beats feature_group_count at model-relevant
    batch. Keyed coarsely — the win comes from the emitter choice, not
    the exact resolution."""
    del cg
    s = _pair(stride)[0]
    # job 105: full-dense-masked (the T=1 special case) won 1.13x at
    # H=56 C=128 s=1; job 134 extends the table to all tiled shapes
    # (every other shape loses). Model-level A/B (job 141): this one
    # entry takes the ResNeXt-50 training step 182.8 -> 159.6 ms
    # (1.145x, 1,604 img/s/chip) — the stage-1 grouped conv's fgc
    # lowering was a far larger share of the full fwd+bwd step than
    # its isolated fwd time suggested.
    return (h, c, s) == (56, 128, 1)


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
    is_pointwise = (kh == 1 and kw == 1 and groups == 1
                    and _pair(stride) == (1, 1)
                    and _resolve_padding(padding, (1, 1), _pair(dilation))
                    in ("VALID", ((0, 0), (0, 0))))
    # Pointwise-conv backward as explicit dots (round-3 experiment:
    # profiling job 011 splits the 68.8 ms of backward conv time into
    # ~24 ms wgrad and ~45 ms dgrad-of-1x1 fusions — the transpose
    # emitter's dgrad, not the wgrad, is the bigger half). Read
    # dynamically so the persistent TPU worker can A/B in-process.
    bwd_mode = os.environ.get("CONVNET_TPU_1X1_BWD", "")
    if is_pointwise and bwd_mode in ("dgrad", "wgrad", "both"):
        f = _make_conv1x1_dot_bwd(x.shape, w.shape, str(x.dtype),
                                  str(w.dtype), bwd_mode)
        return f(x, w)
    if (_DOT_1X1 and is_pointwise):
        b, h, wd, c = x.shape
        y = jax.numpy.matmul(x.reshape(b * h * wd, c),
                             w.reshape(c, -1).astype(x.dtype))
        return y.reshape(b, h, wd, -1)
    pad = _resolve_padding(padding, (kh, kw), _pair(dilation))
    if (_GROUPED_MODE != "fgc" and not isinstance(pad, str)
            and _tiled_grouped_eligible(x.shape, w.shape, groups, dilation)
            and (_GROUPED_MODE == "tiled"
                 or _tiled_grouped_wins(x.shape[1], x.shape[3],
                                        w.shape[2], stride))):
        return _conv2d_grouped_tiled(x, w, _pair(stride), pad, groups)
    if (_DOT_WGRAD and groups == 1 and _pair(dilation) == (1, 1)
            and not isinstance(pad, str)):
        f = _make_conv_dot_wgrad(x.shape, w.shape, _pair(stride), pad,
                                 str(x.dtype), str(w.dtype))
        return f(x, w)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=DIMSPEC,
    )


def _wgrad_dot(x, dy, kshape, stride, pad):
    """dw[di,dj] = x_patch(di,dj)ᵀ · dy, contracting batch*space —
    fp32 accumulation, one dot per tap."""
    kh, kw, cin, cout = kshape
    b = x.shape[0]
    ho, wo = dy.shape[1], dy.shape[2]
    sh, sw = stride
    dyf = dy.reshape(b * ho * wo, cout)
    (plh, phh), (plw, phw) = pad
    if (kh, kw, sh, sw) == (1, 1, 1, 1) and pad == ((0, 0), (0, 0)):
        dw = lax.dot_general(x.reshape(-1, cin), dyf,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        return dw.reshape(kshape)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    taps = []
    for di in range(kh):
        for dj in range(kw):
            patch = lax.slice(
                xp, (0, di, dj, 0),
                (b, di + (ho - 1) * sh + 1, dj + (wo - 1) * sw + 1, cin),
                (1, sh, sw, 1))
            taps.append(lax.dot_general(
                patch.reshape(b * ho * wo, cin), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(kshape)


from functools import lru_cache


@lru_cache(maxsize=None)
def _make_conv_dot_wgrad(x_shape, w_shape, stride, pad, x_dtype, w_dtype):
    """custom_vjp conv: native forward + native data-grad, dot-based
    weight-grad (see _DOT_WGRAD note above)."""

    def _fwd_conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=stride, padding=pad,
            dimension_numbers=DIMSPEC)

    @jax.custom_vjp
    def f(x, w):
        return _fwd_conv(x, w)

    def fwd(x, w):
        return _fwd_conv(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        # data-grad through the native transpose rule (efficient per
        # profiling); weight-grad as dots
        _, pull = jax.vjp(lambda x_: _fwd_conv(x_, w), x)
        dx, = pull(dy)
        dw = _wgrad_dot(x, dy, w_shape, stride, pad).astype(w_dtype)
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


@lru_cache(maxsize=None)
def _make_conv1x1_dot_bwd(x_shape, w_shape, x_dtype, w_dtype, mode):
    """custom_vjp for pointwise (1×1/s1/p0) convs: native forward;
    data-grad and/or weight-grad as explicit dot_generals over
    flattened pixels (mode: 'dgrad' | 'wgrad' | 'both'). A pointwise
    conv's dgrad is dy·Wᵀ and its wgrad Xᵀ·dy — both plain matmuls the
    dot emitter can stream, bypassing the conv transpose emitter."""
    cin, cout = w_shape[2], w_shape[3]
    b, h, wd, _ = x_shape

    def _fwd_conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((0, 0), (0, 0)), dimension_numbers=DIMSPEC)

    @jax.custom_vjp
    def f(x, w):
        return _fwd_conv(x, w)

    def fwd(x, w):
        return _fwd_conv(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        dyf = dy.reshape(b * h * wd, cout)
        if mode in ("dgrad", "both"):
            dx = lax.dot_general(
                dyf, w.reshape(cin, cout).astype(dy.dtype),
                (((1,), (1,)), ((), ()))).reshape(x_shape)
        else:
            _, pull = jax.vjp(lambda x_: _fwd_conv(x_, w), x)
            dx, = pull(dy)
        if mode in ("wgrad", "both"):
            dw = lax.dot_general(
                x.reshape(b * h * wd, cin), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = dw.reshape(w_shape).astype(w_dtype)
        else:
            _, pull = jax.vjp(lambda w_: _fwd_conv(x, w_), w)
            dw, = pull(dy)
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


def conv2d_transpose_output_shape(in_size, kernel, stride, padding):
    """Helper for shape bookkeeping in model builders."""
    k, s, p = kernel, stride, padding
    return (in_size + 2 * p - k) // s + 1
