"""Pallas grouped-conv kernel (ResNeXt's hot op; VERDICT r4 #2).

XLA lowers ``feature_group_count=32`` with the group dimension as a
stride-31 spatial dim and runs at ~25% of its own bytes floor (job
103); every XLA-level reformulation measured (jobs 103/105/134) loses
the FLOP overhead it adds. This kernel sidesteps the emitter instead:

- channels stay on the LANE dimension, split into T = C/128 tiles —
  always 128-aligned, avoiding the Mosaic lane-split pathology that
  killed the folded-layout kernels (jobs 112/114/115);
- the grouped weight is expanded OUTSIDE the kernel into T dense
  (kh*kw, 128, 128) tiles, block-diagonal within each tile (groups
  never straddle a tile: cg | 128) — every tap is then a dense
  128-lane MXU matmul at 128/cg x the grouped FLOPs, far below the
  arithmetic intensity the bus allows at these shapes;
- one padded image x one channel tile per grid program: the k^2 taps
  are static slices of the VMEM-resident padded image (in-VMEM shifted
  taps are free — job 112), accumulated in fp32;
- x is read once and y written once: the kernel is bytes-floor-bound,
  where the fgc lowering is emitter-bound.

Backward: dx (stride 1) is the same kernel with spatially-flipped,
tile-transposed weights (block-diag transpose stays in-tile); stride-2
dx falls back to XLA's dilated fgc transpose. dw uses per-tap
diag-tile batched dots (job 136): x_tap^T @ dy restricted to the T
diagonal 128x128 tiles, off-block products discarded by the extraction
(exact grouped wgrad), fp32 accumulation.

Reference parity: torch grouped Conv2d (models/resnet.py ResNeXt
width/groups knobs, SURVEY.md §2.2); equality vs feature_group_count
tested in tests/test_pallas_grouped.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.ops.conv import _grouped_dense_tiles, _tiled_grouped_eligible
from convnet_tpu.ops.pallas.pool import _out_size, _pair, _parity_tap


def _dense_tiles(w: jax.Array) -> jax.Array:
    """Grouped HWIO weight (kh,kw,cg,C) -> (T, kh*kw, 128, 128) dense
    block-diagonal tiles. Reuses ops/conv.py's tile construction (the
    XLA training lowering) so the two paths cannot drift; only the tap
    axis is flattened for the kernel's BlockSpec."""
    kh, kw, cg, C = w.shape
    return _grouped_dense_tiles(w, C // cg).reshape(C // 128, kh * kw, 128, 128)


@lru_cache(maxsize=None)
def _build_fwd(kernel, stride, padding, shape, dtype_name, interpret):
    """Forward kernel: grid (T, B); one padded image x one 128-channel
    tile per program; k^2 static-slice taps -> dense MXU dots."""
    b, h, w, c = shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dtype = jnp.dtype(dtype_name)
    T = c // 128
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    hp, wp = h + 2 * ph, w + 2 * pw

    def body(x_ref, wt_ref, out_ref):
        x = x_ref[0]                                   # (hp, wp, 128) bf16
        acc = jnp.zeros((h_out * w_out, 128), jnp.float32)
        for di in range(kh):
            rows = _parity_tap(x, 0, di, sh, h_out, 0.0)
            for dj in range(kw):
                patch = _parity_tap(rows, 1, dj, sw, w_out, 0.0)
                acc = acc + jnp.dot(
                    patch.reshape(h_out * w_out, 128),
                    wt_ref[0, di * kw + dj],
                    preferred_element_type=jnp.float32)
        out_ref[0] = acc.reshape(h_out, w_out, 128).astype(out_ref.dtype)

    call = pl.pallas_call(
        body,
        grid=(T, b),
        in_specs=[
            pl.BlockSpec((1, hp, wp, 128), lambda t, i: (i, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh * kw, 128, 128), lambda t, i: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, 128),
                               lambda t, i: (i, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w_out * kh * kw * c * 128,
            bytes_accessed=(b * hp * wp * c + b * h_out * w_out * c) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def run(x, wd):
        xp = (jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
              if (ph or pw) else x)
        return call(xp, wd)

    return run


def _fgc(x, w, stride, padding, groups):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=_pair(stride),
        padding=tuple((p, p) for p in _pair(padding)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _flip_transpose_tiles(wd, kh, kw):
    """Dense tiles for the data-gradient: spatial flip + per-tile
    transpose (block-diagonal structure is preserved)."""
    t, _, _, _ = wd.shape
    w4 = wd.reshape(t, kh, kw, 128, 128)
    w4 = jnp.flip(jnp.flip(w4, 1), 2).transpose(0, 1, 2, 4, 3)
    return w4.reshape(t, kh * kw, 128, 128)


@lru_cache(maxsize=None)
def _make_op(kernel, stride, padding, groups, shape, dtype_name, interpret):
    b, h, w, c = shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    T = c // 128
    cg = c // groups
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    run_fwd = _build_fwd(kernel, stride, padding, shape, dtype_name,
                         interpret)

    @jax.custom_vjp
    def op(x, wt):
        return run_fwd(x, _dense_tiles(wt).astype(x.dtype))

    def fwd(x, wt):
        return run_fwd(x, _dense_tiles(wt).astype(x.dtype)), (x, wt)

    def bwd(res, dy):
        x, wt = res
        # --- dx: stride-1 reuses the forward kernel with flipped,
        # tile-transposed weights; stride-2 falls back to XLA's dilated
        # fgc transpose (no parity-tap form for fractional strides) ---
        if (sh, sw) == (1, 1):
            wd = _dense_tiles(wt).astype(dy.dtype)
            run_bwd = _build_fwd(kernel, (1, 1), (kh - 1 - ph, kw - 1 - pw),
                                 (b, h_out, w_out, c), dtype_name, interpret)
            dx = run_bwd(dy, _flip_transpose_tiles(wd, kh, kw))
            # --- dw: XLA's native fgc wgrad. The per-tap diag-tile
            # dots alternative measured 0.23-0.56x at every stride-1
            # ResNeXt shape (job 136) — the T diagonal 128x128 tiles
            # are 1/T of the einsum's work, so the reformulation pays
            # T x the grouped wgrad FLOPs. fgc's wgrad lowering has no
            # stride-31 pathology (only its fwd/dx do, job 103).
            _, pull_w = jax.vjp(
                lambda w_: _fgc(x, w_, (sh, sw), (ph, pw), groups), wt)
            dw, = pull_w(dy.astype(x.dtype))
        else:
            _, pull = jax.vjp(
                lambda x_, w_: _fgc(x_, w_, (sh, sw), (ph, pw), groups),
                x, wt)
            dx, dw = pull(dy.astype(x.dtype))
        return dx.astype(x.dtype), dw.astype(wt.dtype)

    op.defvjp(fwd, bwd)
    return op


def grouped_conv_pallas(x, wt, stride=1, padding=0, groups=1,
                        interpret=False):
    """NHWC grouped conv; ``wt``: (kh, kw, C/groups, C). Requires
    C % 128 == 0, (128 % cg) == 0, cin == cout, stride ∈ {1, 2}."""
    kernel = (wt.shape[0], wt.shape[1])
    op = _make_op(kernel, _pair(stride), _pair(padding), groups, x.shape,
                  str(x.dtype), interpret)
    return op(x, wt)


def supported(x_shape, wt_shape, groups, stride, dilation=1):
    """Structural eligibility: ops/conv.py's tiled-dense rule (reused,
    not duplicated) plus this kernel's own stride/tap limits."""
    sh, sw = _pair(stride)
    return (_tiled_grouped_eligible(x_shape, wt_shape, groups, dilation)
            and sh <= 2 and sw <= 2)
