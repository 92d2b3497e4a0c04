"""Pallas max-pool backward: fused masked-sum + residue placement.

Replaces the XLA pad-sum backward (ops/pool.py `_mp_bwd_padsum`) for
the reference's ``nn.MaxPool2d`` gradients (models/*.py throughout).
Round-3 motivation (scripts/jobs/done/013, PERF_NOTES session 29d):
the XLA formulation's 9 mask+shift+add passes plus 4 strided
``.at[].set`` placements cost ~7.4 ms at the RN50 stem and ~12 ms
across GoogLeNet's 13 pools, against a ~0.7 ms traffic floor
(read idx u8 + dy, write dx). This kernel does every masked shift,
residue-class sum and W-interleave in VMEM and writes dx once.

Formulation (same math as `_mp_bwd_padsum`, identical first-match
routing): input coordinate i = s·a + r is covered by window a+u for
each tap d with d ≡ (r+p) (mod s), u = (r+p-d)/s. Per residue class
(rr, rc) the contribution is a sum of ≤⌈k/s⌉² SHIFTED masked-dy
planes in OUTPUT geometry — all shifts unit-stride and static.

Placement: Mosaic (jobs 033/035) rejects strided vector slices, the
stack+reshape interleave (`tpu.reshape` inserting a unit dim is an
"unsupported shape cast"), in-kernel uint8→bf16 casts AND bool→bf16
converts — so the kernel emits one rank-5 block
``[B, n_h, s_h·s_w, n_w, C]`` with a plane per residue class (static
rank-5 writes are supported), masks with the arithmetic indicator
max(0, 1-(idx-t)²) (Mosaic also rejects bf16 compares), receives the
winner index pre-converted to the gradient dtype by XLA, and leaves
the final disjoint strided ``.at[].set``
placement to XLA (stride-1 pools — GoogLeNet's branch pools — have a
single class and skip placement entirely).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# single-sourced residue-class helpers — the shift/tap arithmetic must
# be identical across the XLA pad-sum and this Pallas formulation
from convnet_tpu.ops.pool import _class_taps, _pair, _shift2  # noqa: E402


def _bwd_kernel(idx_ref, dy_ref, dx_ref, *, kernel, stride, padding,
                x_hw):
    """dx_ref: [NB, nh, n_cls, nw, C] — one plane per residue class
    (cls = rr*sw + rc), written with static rank-5 indexing (Mosaic
    accepts static writes into a rank-5 block; it rejects the
    stack+reshape interleave, bool->bf16 converts AND bf16 compares —
    see scripts/jobs/done/035_mosaic_bisect.out and 039)."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    h, w = x_hw
    dy = dy_ref[...]
    idxf = idx_ref[...]
    zero = jnp.zeros((), dy.dtype)

    # masked per-tap contributions (output geometry), computed once.
    # Mosaic rejects bf16 compares outright (arith.cmpf on the packed
    # (8,128,2) bf16 layout -> i1, job 039), so the {0,1} indicator is
    # computed ARITHMETICALLY: for integer-valued idx and tap id t,
    # max(0, 1-(idx-t)²) is exactly 1 at idx==t and 0 otherwise
    # (tap ids ≤ 24, all squares exact in bf16).
    one = jnp.ones((), dy.dtype)
    contrib = {}
    for di in range(kh):
        for dj in range(kw):
            t = di * kw + dj
            delta = idxf - jnp.asarray(t, idxf.dtype)
            ind = jnp.maximum(one - delta * delta, zero)
            contrib[(di, dj)] = dy * ind

    nh = max((h - rr + sh - 1) // sh for rr in range(sh))
    nw = max((w - rc + sw - 1) // sw for rc in range(sw))

    for rr in range(sh):
        rtaps = _class_taps(rr, ph, kh, sh)
        for rc in range(sw):
            ctaps = _class_taps(rc, pw, kw, sw)
            plane = None
            for di, du in rtaps:
                for dj, dv in ctaps:
                    m = _shift2(contrib[(di, dj)], du, dv, nh, nw)
                    plane = m if plane is None else plane + m
            if plane is None:
                plane = jnp.zeros(dy.shape[:1] + (nh, nw, dy.shape[3]),
                                  dy.dtype)
            dx_ref[:, :, rr * sw + rc, :, :] = plane


@lru_cache(maxsize=None)
def _build(kernel, stride, padding, x_shape, dy_shape, dy_dtype,
           x_dtype, interpret):
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    b, h, w, c = x_shape
    _, ho, wo, _ = dy_shape
    nh = max((h - rr + sh - 1) // sh for rr in range(sh))
    nw = max((w - rc + sw - 1) // sw for rc in range(sw))
    n_cls = sh * sw

    # batch block: keep the working set (idx+dy+k² contribs+out) under
    # ~10 MB of VMEM (itemsize-aware: supported() also admits fp32)
    isz = jnp.dtype(dy_dtype).itemsize
    per_img = (ho * wo * c * isz * (2 + kh * kw)
               + nh * n_cls * nw * c * isz)
    nb = 1
    while (nb * 2 <= b and per_img * nb * 2 < 10 * 2 ** 20
           and b % (nb * 2) == 0):
        nb *= 2

    kern = partial(_bwd_kernel, kernel=kernel, stride=stride,
                   padding=padding, x_hw=(h, w))
    call = pl.pallas_call(
        kern,
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, ho, wo, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((nb, ho, wo, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, nh, n_cls, nw, c),
                               lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, n_cls, nw, c),
                                       jnp.dtype(dy_dtype)),
        interpret=bool(interpret),
    )

    def bwd(idx, dy):
        grouped = call(idx.astype(dy.dtype), dy)
        if n_cls == 1:
            dx = grouped[:, :, 0, :, :]
            if nh != h or nw != w:
                dx = jax.lax.slice(dx, (0, 0, 0, 0), (b, h, w, c))
            return dx.astype(jnp.dtype(x_dtype))
        # residue placement in XLA: classes are disjoint strided sets
        dx = jnp.zeros((b, h, w, c), grouped.dtype)
        for rr in range(sh):
            n_h = (h - rr + sh - 1) // sh
            for rc in range(sw):
                n_w = (w - rc + sw - 1) // sw
                plane = grouped[:, :n_h, rr * sw + rc, :n_w, :]
                dx = dx.at[:, rr::sh, rc::sw, :].set(plane)
        return dx.astype(jnp.dtype(x_dtype))

    return bwd


def supported(kernel, stride, padding, x_shape, dy_dtype):
    """EXPERIMENTAL formulation status (round-3 hardware campaign,
    scripts/jobs/done/036-040): after working around every Mosaic
    limitation (no strided slices, no stack+reshape interleave, no
    u8→bf16 casts, no bf16 compares), the kernel compiles and is
    bit-exact at some shapes (28²×480: maxerr 0) but still crashes the
    Mosaic compiler at others (112²×64, 14²×528) and runs ~3.5× slower
    than the XLA pad-sum path where it does compile — consistent with
    every Pallas-pool datapoint since round 1 (relayout costs dominate
    on this backend). Default-off; exactness is regression-tested in
    interpret mode for backends with weaker window fusion."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    if jnp.dtype(dy_dtype) not in (jnp.dtype(jnp.bfloat16),
                                   jnp.dtype(jnp.float32)):
        return False
    # residue-class math needs s <= k (every pool in the zoo) and the
    # grouped-H trick needs at least one full row per class
    return sh <= kh and sw <= kw and x_shape[1] >= sh and x_shape[2] >= sw


def max_pool2d_bwd_pallas(kernel, stride, padding, x_shape, x_dtype,
                          idx, dy, interpret=False):
    """dx from the forward's winner-index (u8, first-match) and dy —
    drop-in replacement for ops/pool.py `_mp_bwd_padsum`."""
    f = _build(_pair(kernel), _pair(stride), _pair(padding),
               tuple(x_shape), tuple(dy.shape), str(dy.dtype),
               str(x_dtype), bool(interpret))
    return f(idx, dy)
