"""Pallas fused matmul + per-column scale/shift + activation.

The MXU kernel behind the framework's fused inference path: a 1×1 conv
(or Linear) with a folded BatchNorm and ReLU is exactly
``act((X @ W) * scale + shift)`` with X = (N·H·W, Cin). This is the
"conv+BN+ReLU blocks fuse into Pallas kernels" north star for the
pointwise convs that dominate ResNet-50 (>half its conv FLOPs) and all
of MobileNet's pointwise stages.

Measured context (see git history): XLA on this backend already fuses
the scale/shift/ReLU epilogue into the convolution at matmul-parity
speed, so the kernel's value is (a) a guaranteed fusion floor
independent of XLA's pattern-matching, (b) the building block for
deeper fusions (residual-add epilogues). Grid tiles (M, N); K is kept
whole per tile (ResNet/MobileNet K ≤ 2048 → ≤1 MB bf16 per operand
tile).

Training-mode BN needs batch statistics and uses the XLA path; this
kernel is routed in eval/inference (`ctx.impl == 'pallas'`).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


@lru_cache(maxsize=None)
def _build(m, k, n, dtype_name, act, tile_m, tile_n, interpret):
    dtype = jnp.dtype(dtype_name)

    def body(x_ref, w_ref, scale_ref, shift_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        acc = acc * scale_ref[:] + shift_ref[:]
        if act == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif act == "relu6":
            acc = jnp.clip(acc, 0.0, 6.0)
        o_ref[:] = acc.astype(o_ref.dtype)

    grid = (m // tile_m, n // tile_n)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype),
        interpret=interpret,
    )


def _forward(x, w, scale, shift, act, tile_m, tile_n, interpret):
    m, k = x.shape
    n = w.shape[1]
    tile_m = min(tile_m, _round_up(m, 8))
    tile_n = min(tile_n, _round_up(n, 128))
    mp = _round_up(m, tile_m)
    np_ = _round_up(n, tile_n)
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    wp = jnp.pad(w, ((0, 0), (0, np_ - n))) if np_ != n else w
    sp = jnp.pad(scale, (0, np_ - n)) if np_ != n else scale
    bp = jnp.pad(shift, (0, np_ - n)) if np_ != n else shift
    call = _build(mp, k, np_, str(x.dtype), act, tile_m, tile_n, interpret)
    out = call(xp, wp.astype(x.dtype), sp.reshape(1, -1), bp.reshape(1, -1))
    return out[:m, :n]


@lru_cache(maxsize=None)
def _make_op(act, tile_m, tile_n, interpret):
    @jax.custom_vjp
    def op(x, w, scale, shift):
        return _forward(x, w, scale, shift, act, tile_m, tile_n, interpret)

    def fwd(x, w, scale, shift):
        y = _forward(x, w, scale, shift, act, tile_m, tile_n, interpret)
        return y, (x, w, scale, y)

    def bwd(res, dy):
        x, w, scale, y = res
        dy = dy.astype(jnp.float32)
        if act == "relu":
            dy = dy * (y > 0)
        elif act == "relu6":
            dy = dy * ((y > 0) & (y < 6))
        r = (dy * scale).astype(x.dtype)           # d(acc)
        dx = jnp.matmul(r, w.astype(x.dtype).T)
        dw = jnp.matmul(x.T, r).astype(w.dtype)
        # dscale needs the pre-scale accumulator: recompute one matmul
        acc = jnp.matmul(x, w.astype(x.dtype)).astype(jnp.float32)
        dscale = jnp.sum(dy * acc, axis=0)
        dshift = jnp.sum(dy, axis=0)
        return dx.astype(x.dtype), dw, dscale, dshift

    op.defvjp(fwd, bwd)
    return op


def matmul_scale_act(x, w, scale=None, shift=None, act="relu",
                     tile_m=256, tile_n=256, interpret=False):
    """``act((x @ w) * scale + shift)`` — x (M, K), w (K, N),
    scale/shift (N,) fp32 (None → 1/0). M and N are padded to tile
    multiples (padding rows/cols are sliced off). Differentiable
    (custom VJP; backward via XLA matmuls)."""
    n = w.shape[1]
    scale = jnp.ones(n, jnp.float32) if scale is None else scale.astype(jnp.float32)
    shift = jnp.zeros(n, jnp.float32) if shift is None else shift.astype(jnp.float32)
    return _make_op(act, tile_m, tile_n, interpret)(x, w, scale, shift)


def conv1x1_bn_act(x, w, scale=None, shift=None, act="relu",
                   interpret=False):
    """Fused 1×1 conv + folded-BN + activation on NHWC input.
    ``w``: (1, 1, Cin, Cout) or (Cin, Cout)."""
    b, h, ww, cin = x.shape
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    out = matmul_scale_act(x.reshape(-1, cin), w2, scale, shift, act,
                           interpret=interpret)
    return out.reshape(b, h, ww, -1)
