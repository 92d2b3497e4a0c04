"""Pallas depthwise-conv kernel (MobileNet's hot op).

Depthwise convolution is MXU-unfriendly — each output channel contracts
only k² scalars — so it belongs on the VPU with channels on lanes
(BASELINE.json: "MobileNet-V2 ImageNet (depthwise-separable conv Pallas
path)"). Each grid program handles one image's row chunk: the k² taps
are strided slices of the halo'd input window (parity reshapes — Mosaic
forbids strided vector slices) multiplied by per-channel weights
broadcast over (rows, cols), accumulated in fp32.

Backward:
- dx (stride 1): depthwise correlation of dy with the spatially-flipped
  kernel — the same Pallas kernel with transformed weights/padding.
- dw: per-tap reduction  Σ_{b,i,j} x·dy  — reduction-bound, XLA's
  strength; computed with strided slices + sums.
- stride-2 dx falls back to the XLA transposed conv.

Window materialization mirrors ops/pallas/pool.py (halos are
inexpressible in BlockSpec; ANY-space DMA hangs this backend).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.ops.pallas.pool import (
    _pair, _out_size, _chunk_of, _parity_tap, _windows)


@lru_cache(maxsize=None)
def _build_fwd(kernel, stride, padding, shape, dtype_name, interpret):
    b, h, w, c = shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dtype = jnp.dtype(dtype_name)
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    wp = w + 2 * pw

    chunk = _chunk_of(h_out, 8)
    n_chunks = h_out // chunk
    in_rows = (chunk - 1) * sh + kh

    def body(xw_ref, wt_ref, out_ref):
        x = xw_ref[0, 0].astype(jnp.float32)
        wt = wt_ref[:].astype(jnp.float32)          # (kh*kw, c)
        acc = None
        for di in range(kh):
            rows = _parity_tap(x, 0, di, sh, chunk, 0.0)
            for dj in range(kw):
                patch = _parity_tap(rows, 1, dj, sw, w_out, 0.0)
                term = patch * wt[di * kw + dj][None, None, :]
                acc = term if acc is None else acc + term
        out_ref[0] = acc.astype(out_ref.dtype)

    call = pl.pallas_call(
        body,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, in_rows, wp, c), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, w_out, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), dtype),
        interpret=interpret,
    )

    def run(x, wt):
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0))) if (ph or pw) else x
        xw = _windows(xp, 1, [j * chunk * sh for j in range(n_chunks)],
                      in_rows)
        return call(xw, wt.reshape(kh * kw, c).astype(x.dtype))

    return run


def _dw_xla(x, wt, stride, padding, c):
    return jax.lax.conv_general_dilated(
        x, wt, window_strides=_pair(stride),
        padding=tuple((p, p) for p in _pair(padding)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@lru_cache(maxsize=None)
def _make_op(kernel, stride, padding, shape, dtype_name, interpret):
    b, h, w, c = shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    run_fwd = _build_fwd(kernel, stride, padding, shape, dtype_name,
                         interpret)

    @jax.custom_vjp
    def op(x, wt):
        return run_fwd(x, wt)

    def fwd(x, wt):
        return run_fwd(x, wt), (x, wt)

    def _dx_xla_dilated(wt, dy):
        # gradient of the strided depthwise conv via lhs-dilated conv
        wt_flip = jnp.flip(jnp.flip(wt, 0), 1).astype(dy.dtype)
        return jax.lax.conv_general_dilated(
            dy, wt_flip, window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + (h + 2 * ph - kh) % sh),
                     (kw - 1 - pw, kw - 1 - pw + (w + 2 * pw - kw) % sw)),
            lhs_dilation=(sh, sw),
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bwd(res, dy):
        x, wt = res
        # --- dx ---
        if (sh, sw) == (1, 1):
            # correlation with the flipped kernel, pad (k-1-p): same
            # Pallas kernel shape, reused
            run_bwd = _build_fwd(kernel, (1, 1), (kh - 1 - ph, kw - 1 - pw),
                                 (b, h_out, w_out, c), dtype_name, interpret)
            dx = run_bwd(dy, jnp.flip(jnp.flip(wt, 0), 1))
        else:
            dx = _dx_xla_dilated(wt, dy)
        # --- dw: per-tap reduction (XLA's strength) ---
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        dy32 = dy.astype(jnp.float32)
        taps = []
        for di in range(kh):
            row = []
            for dj in range(kw):
                patch = jax.lax.slice(
                    xp, (0, di, dj, 0),
                    (b, di + (h_out - 1) * sh + 1, dj + (w_out - 1) * sw + 1, c),
                    (1, sh, sw, 1)).astype(jnp.float32)
                row.append(jnp.sum(patch * dy32, axis=(0, 1, 2)))
            taps.append(jnp.stack(row))
        dw = jnp.stack(taps).reshape(kh, kw, 1, c).astype(wt.dtype)
        return dx.astype(x.dtype), dw

    op.defvjp(fwd, bwd)
    return op


def depthwise_conv_pallas(x, wt, stride=1, padding=0, interpret=False):
    """NHWC depthwise conv; ``wt``: (kh, kw, 1, C). Strides ∈ {1, 2}."""
    kernel = (wt.shape[0], wt.shape[1])
    op = _make_op(kernel, _pair(stride), _pair(padding), x.shape,
                  str(x.dtype), interpret)
    return op(x, wt)


def supported(x_shape, wt_shape, stride):
    sh, sw = _pair(stride)
    return sh <= 2 and sw <= 2
