"""Pallas max-pool kernels (forward with argmax + scatter-free backward).

Why: XLA on this backend lowers both ``reduce_window``'s VJP
(select-and-scatter) and strided-slice decompositions poorly — the
ResNet-50 stem max-pool backward alone cost ~15 ms/step at batch 256
(≈13% of the whole train step).

Design notes (each constraint was hit for real on the axon backend):
- grid = (batch, row_chunks); each program sees one halo'd row window.
  Halos can't be expressed with BlockSpec index maps (blocks are
  disjoint), and manual HBM→VMEM DMA from `pltpu.ANY` refs hard-hangs
  this backend — so the overlapping windows are materialized by XLA
  *before* the call (row-overlap factor ≈ (chunk·s+k−s)/(chunk·s) ≈
  1.06, one cheap extra pass over the activation).
- Per-program temporaries must stay ~100 KB: Mosaic allocates every
  SSA value on the scoped-VMEM stack without slot reuse.
- Stride-2 taps use parity reshapes (contiguous reshape + unit-stride
  slice): Mosaic forbids strided vector slices.
- All compute in fp32 with int32 argmax: Mosaic cannot relayout i1
  masks between differently-tiled dtypes (bf16 (16,128) vs uint8
  (32,128)).
- The backward reassembles the strided scatter with residue
  interleaves (same math as ops/pool.py ``_mp_bwd``); its one dynamic
  crop goes through a VMEM scratch ref (no dynamic_slice on values in
  Pallas TPU).

First-match tie-breaking (strict ``>``) matches torch/cudnn's
single-winner gradient routing.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _out_size(size, k, s, p):
    return (size + 2 * p - k) // s + 1


def _chunk_of(n, cap):
    """Largest divisor of n that is ≤ cap."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


_NEG = -3.0e38  # ≈ -f32 max; a "-inf" that survives bf16 casts


def _parity_tap(v, axis, d, step, n, fill=0.0):
    """v[d : d+n*step : step] along ``axis``; step ∈ {1, 2}."""
    if step == 1:
        starts = [0] * v.ndim
        limits = list(v.shape)
        starts[axis] = d
        limits[axis] = d + n
        return jax.lax.slice(v, starts, limits)
    assert step == 2, "pool strides >2 unsupported in the pallas path"
    size = v.shape[axis]
    need = d + 2 * (n - 1) + 1
    if size % 2 or need > size:
        extra = max(need - size, 0) + ((size + max(need - size, 0)) % 2)
        zshape = tuple(extra if a == axis else s
                       for a, s in enumerate(v.shape))
        v = jnp.concatenate([v, jnp.full(zshape, fill, v.dtype)], axis=axis)
        size += extra
    shape = list(v.shape)
    shape[axis:axis + 1] = [size // 2, 2]
    v = v.reshape(shape)
    starts = [0] * v.ndim
    limits = list(v.shape)
    starts[axis] = d // 2
    limits[axis] = d // 2 + n
    starts[axis + 1] = d % 2
    limits[axis + 1] = d % 2 + 1
    v = jax.lax.slice(v, starts, limits)
    shape = list(v.shape)
    shape[axis:axis + 2] = [n]
    return v.reshape(shape)


def _shift(xv, axis, lo, hi):
    if lo == 0 and hi == 0:
        return xv
    parts = []
    if lo:
        parts.append(jnp.zeros(
            tuple(lo if a == axis else d for a, d in enumerate(xv.shape)),
            xv.dtype))
    parts.append(xv)
    if hi:
        parts.append(jnp.zeros(
            tuple(hi if a == axis else d for a, d in enumerate(xv.shape)),
            xv.dtype))
    return jnp.concatenate(parts, axis=axis)


def _interleave_static(planes, axis, lo, target):
    stacked = jnp.stack(planes, axis=axis + 1)
    shape = list(stacked.shape)
    shape[axis:axis + 2] = [shape[axis] * shape[axis + 1]]
    merged = stacked.reshape(shape)
    if merged.shape[axis] < lo + target:
        zshape = tuple(lo + target - merged.shape[axis] if a == axis else d
                       for a, d in enumerate(merged.shape))
        merged = jnp.concatenate([merged, jnp.zeros(zshape, merged.dtype)],
                                 axis=axis)
    sl = [slice(None)] * merged.ndim
    sl[axis] = slice(lo, lo + target)
    return merged[tuple(sl)]


def _windows(x, axis, starts, length):
    """Stack overlapping windows x[..., s:s+length, ...] along a new
    leading-of-axis dim — the XLA-side halo materialization."""
    slices = []
    for s in starts:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(s, s + length)
        slices.append(x[tuple(sl)])
    return jnp.stack(slices, axis=axis)


@lru_cache(maxsize=None)
def _build(kernel, stride, padding, shape, dtype_name, interpret):
    b, h, w, c = shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dtype = jnp.dtype(dtype_name)
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    wp = w + 2 * pw

    # ---------------- forward -------------------------------------
    f_chunk = _chunk_of(h_out, 8)
    n_f = h_out // f_chunk
    f_in_rows = (f_chunk - 1) * sh + kh

    def fwd_body(xw_ref, out_ref, idx_ref):
        x = xw_ref[0, 0].astype(jnp.float32)
        out = None
        idx = None
        for di in range(kh):
            rows = _parity_tap(x, 0, di, sh, f_chunk, _NEG)
            for dj in range(kw):
                t = di * kw + dj
                patch = _parity_tap(rows, 1, dj, sw, w_out, _NEG)
                if out is None:
                    out = patch
                    idx = jnp.zeros(patch.shape, jnp.int32)
                else:
                    better = patch > out
                    out = jnp.where(better, patch, out)
                    idx = jnp.where(better, jnp.int32(t), idx)
        out_ref[0] = out.astype(out_ref.dtype)
        idx_ref[0] = idx

    fwd_call = pl.pallas_call(
        fwd_body,
        grid=(b, n_f),
        in_specs=[pl.BlockSpec((1, 1, f_in_rows, wp, c),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, f_chunk, w_out, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_chunk, w_out, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h_out, w_out, c), dtype),
            jax.ShapeDtypeStruct((b, h_out, w_out, c), jnp.int32),
        ),
        interpret=interpret,
    )

    def run_fwd_pallas(x):
        neg = jnp.asarray(_NEG, x.dtype)
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                     constant_values=neg) if (ph or pw) else x
        xw = _windows(xp, 1, [j * f_chunk * sh for j in range(n_f)],
                      f_in_rows)
        return fwd_call(xw)

    def run_fwd(x):
        # HYBRID (measured on v5e, B=256 112²×64 bf16):
        #   forward:  XLA strided-slice argmax ~3 ms; the Pallas forward
        #             pays ~21 ms in Mosaic sublane relayouts for its
        #             parity-reshape taps → use XLA.
        #   backward: this windowed many-small-programs Pallas kernel
        #             ~10 ms vs XLA's ~20 ms (select-free reassembly)
        #             → use Pallas. (A fori_loop whole-image variant was
        #             ~55 ms: per-chunk relayouts dominate when one
        #             program walks many chunks.)
        from convnet_tpu.ops.pool import _mp_fwd_argmax
        out, idx8 = _mp_fwd_argmax(x, kernel, stride, padding)
        return out, idx8.astype(jnp.int32)

    # ---------------- backward ------------------------------------
    qh = (kh - 1) // sh
    qw = (kw - 1) // sw
    b_chunk = _chunk_of(h, 16)
    n_b = h // b_chunk
    n_dy = min(h_out, (b_chunk + kh - 2) // sh + 2)
    merged_rows = (n_dy + qh) * sh
    crop_rows = merged_rows + b_chunk + 2 * sh

    def oy_lo_of(r0):
        ideal = -((-(r0 + ph - kh + 1)) // sh)       # ceil division
        return min(max(ideal, 0), h_out - n_dy)

    oy_los = [oy_lo_of(j * b_chunk) for j in range(n_b)]
    los = [j * b_chunk + ph - sh * oy_los[j] for j in range(n_b)]

    def cols_for_row_tap(dy, idx, di):
        col_planes = []
        for rc in range(sw):
            acc = None
            for dj in range(rc, kw, sw):
                contrib = jnp.where(idx == di * kw + dj, dy, 0.0)
                s = _shift(contrib, 1, dj // sw, qw - dj // sw)
                acc = s if acc is None else acc + s
            if acc is None:
                acc = jnp.zeros((dy.shape[0], dy.shape[1] + qw, c),
                                jnp.float32)
            col_planes.append(acc)
        return _interleave_static(col_planes, 1, pw, w)

    # per-chunk crop offsets, prefetched to SMEM via the index table.
    # numpy here: a jnp constant built during a caller's trace would be
    # cached by lru_cache and leak the tracer into later traces
    import numpy as _np
    lo_table = _np.asarray(los, _np.int32)

    def bwd_body(lo_ref, dyw_ref, idxw_ref, dx_ref, crop):
        j = pl.program_id(1)
        dy = dyw_ref[0, 0].astype(jnp.float32)
        idx = idxw_ref[0, 0]
        row_terms = [cols_for_row_tap(dy, idx, di) for di in range(kh)]
        row_planes = []
        for rr in range(sh):
            acc = None
            for di in range(rr, kh, sh):
                s = _shift(row_terms[di], 0, di // sh, qh - di // sh)
                acc = s if acc is None else acc + s
            if acc is None:
                acc = jnp.zeros((row_terms[0].shape[0] + qh, w, c),
                                jnp.float32)
            row_planes.append(acc)
        stacked = jnp.stack(row_planes, axis=1)
        shp = list(stacked.shape)
        shp[0:2] = [shp[0] * shp[1]]
        merged = stacked.reshape(shp)
        # dynamic crop [lo, lo+b_chunk) via scratch (no value dyn-slice)
        crop[pl.ds(0, merged_rows), :, :] = merged
        crop[pl.ds(merged_rows, crop_rows - merged_rows), :, :] = jnp.zeros(
            (crop_rows - merged_rows, w, c), jnp.float32)
        lo = lo_ref[j]
        dx_ref[0] = crop[pl.ds(lo, b_chunk), :, :].astype(dx_ref.dtype)

    bwd_call = pl.pallas_call(
        bwd_body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_b),
            in_specs=[
                pl.BlockSpec((1, 1, n_dy, w_out, c),
                             lambda i, j, lo_ref: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_dy, w_out, c),
                             lambda i, j, lo_ref: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b_chunk, w, c),
                                   lambda i, j, lo_ref: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((crop_rows, w, c), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        interpret=interpret,
    )

    def run_bwd(idx, dy):
        dyw = _windows(dy, 1, oy_los, n_dy)
        idxw = _windows(idx, 1, oy_los, n_dy)
        return bwd_call(jnp.asarray(lo_table), dyw.astype(dtype), idxw)

    @jax.custom_vjp
    def mp(x):
        return run_fwd(x)[0]

    def fwd(x):
        out, idx = run_fwd(x)
        return out, idx

    def bwd(idx, dy):
        return (run_bwd(idx, dy),)

    mp.defvjp(fwd, bwd)
    return mp


def max_pool2d_pallas(x, kernel, stride=None, padding=0, interpret=False):
    stride = stride if stride is not None else kernel
    mp = _build(_pair(kernel), _pair(stride), _pair(padding), x.shape,
                str(x.dtype), interpret)
    return mp(x)


def supported(x_shape, kernel, stride=None, padding=0):
    """Whether the pallas path handles this config (strides ≤ 2)."""
    stride = stride if stride is not None else kernel
    sh, sw = _pair(stride)
    return sh <= 2 and sw <= 2
