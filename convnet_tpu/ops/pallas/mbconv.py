"""Fused inverted-residual (MBConv) Pallas kernel — MobileNet's block.

Why this kernel exists (round-4 jobs 100/101): the MobileNet-V2 train
step moves 38.3 GB/step — ~102% of the XLA-counted HBM bytes floor —
because XLA cannot fuse across convolutions: every block's 6×-expanded
hidden tensors (e.g. 231 MB at 56²×144, B=256) round-trip HBM between
the expand-1×1, the depthwise 3×3 and the project-1×1. This kernel
computes the whole block in ONE VMEM residency:

    [expand 1×1 (MXU) → BN → ReLU6] → depthwise 3×3 s1 (VPU) → BN →
    ReLU6 → project 1×1 (MXU) → BN [+ residual]

so HBM only ever sees the block's SMALL input/output tensors (Cin/Cout
= 16–320 vs hidden 96–960). Reference counterpart: the torch reference
runs these as separate cuDNN calls (SURVEY.md §2.2 MobileNet row); the
fusion is the TPU-native reformulation BASELINE.json names as the
"depthwise-separable conv Pallas path".

Design notes:
- stride-1 3×3 depthwise only (13 of 17 MNv2 blocks): all tap slices
  are static, avoiding the stride-2 parity-reshape relayouts that sank
  the standalone depthwise kernel (nn/layers.py:51-56, round 2).
- halo rows come from fetching the SAME input three times with
  neighbor block index maps (j-1, j, j+1, clamped) — no windows
  tensor is materialized in HBM (cf. ops/pallas/pool.py's _windows).
- columns are pre-padded once in XLA (W+2); padding positions are
  zeroed in-kernel AFTER the BN shift via an iota mask (a padded pixel
  through BN would contribute shift≠0 to the depthwise taps).
- training-mode BN: batch stats for the expand BN come from the Gram
  trick in XLA (E[h²] = diag(WeᵀGWe)/N with G = XᵀX — h is linear in
  x, so no hidden tensor is materialized); the depthwise-BN stats come
  from a 'stats' kernel pass; the project-BN stats ride along as a
  (2, Cout) accumulator output of the main pass, whose raw conv output
  is normalized by one cheap XLA elementwise op.
- grid iterations execute sequentially on TPU, so (2, C) stat
  accumulators use a constant output index map, initialized at the
  first grid step (standard Pallas reduction pattern).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_of(n, cap):
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _act(v, kind):
    if kind == "relu":
        return jnp.maximum(v, 0.0)
    if kind == "relu6":
        return jnp.clip(v, 0.0, 6.0)
    return v


def _nbr_in_specs(chunk, wp, c, n_chunks):
    """Three specs fetching row-blocks j-1, j, j+1 (clamped) of
    (B, H, Wp, C) — the halo rows without a windows tensor."""
    return [
        pl.BlockSpec((1, chunk, wp, c),
                     lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, wp, c), lambda b, j: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, wp, c),
                     lambda b, j: (b, jnp.minimum(j + 1, n_chunks - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _wspec(shape):
    return pl.BlockSpec(shape, lambda b, j: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _assemble_rows(xp, xc, xn, chunk):
    """(chunk+2) haloed rows from the three fetched blocks."""
    return jnp.concatenate(
        [xp[chunk - 1:chunk], xc, xn[0:1]], axis=0)


def _hidden(xw, we_ref, s1, t1, mask, act_mid, chunk, wp):
    """Expand + BN + act (+ padding mask) on the haloed rows; returns
    fp32 (chunk+2, wp, Ch). ``we_ref`` None → no expand stage (the
    t=1 block / MobileNet-v1 pair): the input is only masked (padding
    rows of a clamped neighbor fetch hold garbage, not zeros)."""
    if we_ref is not None:
        cin = xw.shape[-1]
        h = jnp.dot(xw.reshape((chunk + 2) * wp, cin),
                    we_ref[:], preferred_element_type=jnp.float32)
        h = h * s1 + t1
        h = _act(h, act_mid)
        h = h.reshape(chunk + 2, wp, -1)
    else:
        h = xw.astype(jnp.float32)
        if s1 is not None:  # pre-BN'd input variant (unused today)
            h = _act(h * s1 + t1, act_mid)
    return jnp.where(mask, h, 0.0)


def _mask(chunk, wp, h_total, j):
    """(chunk+2, wp, 1) validity mask: rows map to global image rows
    j*chunk-1 … j*chunk+chunk, cols 1…wp-2 are real."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 1)
    grow = rows + j * chunk - 1
    return ((grow >= 0) & (grow < h_total)
            & (cols >= 1) & (cols <= wp - 2))


def _dw(u1, wd_ref, chunk, w):
    """9-tap stride-1 depthwise on the haloed fp32 block → (chunk, w, Ch)."""
    acc = None
    for di in range(3):
        for dj in range(3):
            tap = u1[di:di + chunk, dj:dj + w, :]
            term = tap * wd_ref[3 * di + dj][None, None, :]
            acc = term if acc is None else acc + term
    return acc


@lru_cache(maxsize=None)
def _build_full(shape, ch, cout, has_expand, residual, act_mid, act_out,
                dtype_name, interpret):
    """Single-pass kernel: whole block with folded BN (inference), or
    train phase-B when (s3,t3) are identity and bn3 happens outside."""
    b, h, wp, cin = shape
    w = wp - 2
    chunk = _chunk_of(h, 28)
    n_chunks = h // chunk
    dtype = jnp.dtype(dtype_name)

    def body(*refs):
        i = 0
        xp_ref, xc_ref, xn_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        we_ref = s1_ref = t1_ref = None
        if has_expand:
            we_ref, s1_ref, t1_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
        wd_ref, s2_ref, t2_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        wpj_ref, s3_ref, t3_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        out_ref = refs[i]

        j = pl.program_id(1)
        xw = _assemble_rows(xp_ref[0], xc_ref[0], xn_ref[0], chunk)
        mask = _mask(chunk, wp, h, j)
        u1 = _hidden(xw, we_ref,
                     s1_ref[:] if s1_ref is not None else None,
                     t1_ref[:] if t1_ref is not None else None,
                     mask, act_mid, chunk, wp)
        acc = _dw(u1, wd_ref, chunk, w)
        u2 = _act(acc * s2_ref[:][None] + t2_ref[:][None], act_mid)
        y = jnp.dot(u2.reshape(chunk * w, ch).astype(dtype), wpj_ref[:],
                    preferred_element_type=jnp.float32)
        y = y * s3_ref[:] + t3_ref[:]
        if residual:
            res = xc_ref[0][:, 1:w + 1, :].reshape(chunk * w, cin)
            y = y + res.astype(jnp.float32)
        y = _act(y, act_out)
        out_ref[0] = y.reshape(chunk, w, cout).astype(out_ref.dtype)

    in_specs = _nbr_in_specs(chunk, wp, cin, n_chunks)
    if has_expand:
        in_specs += [_wspec((cin, ch)), _wspec((1, ch)), _wspec((1, ch))]
    in_specs += [_wspec((9, ch)), _wspec((1, ch)), _wspec((1, ch))]
    in_specs += [_wspec((ch, cout)), _wspec((1, cout)), _wspec((1, cout))]

    return pl.pallas_call(
        body,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, chunk, w, cout),
                               lambda bb, j: (bb, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dtype),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_raw(shape, ch, cout, has_expand, act_mid, dtype_name, interpret):
    """Train phase-B kernel: raw project output + its (Σ, Σ²) channel
    sums (for the project-BN batch stats, finalized in XLA)."""
    b, h, wp, cin = shape
    w = wp - 2
    chunk = _chunk_of(h, 28)
    n_chunks = h // chunk
    dtype = jnp.dtype(dtype_name)

    def body(*refs):
        i = 0
        xp_ref, xc_ref, xn_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        we_ref = s1_ref = t1_ref = None
        if has_expand:
            we_ref, s1_ref, t1_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
        wd_ref, s2_ref, t2_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        wpj_ref = refs[i]
        i += 1
        out_ref, sum_ref = refs[i], refs[i + 1]

        bb = pl.program_id(0)
        j = pl.program_id(1)
        xw = _assemble_rows(xp_ref[0], xc_ref[0], xn_ref[0], chunk)
        mask = _mask(chunk, wp, h, j)
        u1 = _hidden(xw, we_ref,
                     s1_ref[:] if s1_ref is not None else None,
                     t1_ref[:] if t1_ref is not None else None,
                     mask, act_mid, chunk, wp)
        acc = _dw(u1, wd_ref, chunk, w)
        u2 = _act(acc * s2_ref[:][None] + t2_ref[:][None], act_mid)
        y = jnp.dot(u2.reshape(chunk * w, ch).astype(dtype), wpj_ref[:],
                    preferred_element_type=jnp.float32)
        out_ref[0] = y.reshape(chunk, w, -1).astype(out_ref.dtype)

        part = jnp.stack([jnp.sum(y, axis=0), jnp.sum(y * y, axis=0)])

        @pl.when((bb == 0) & (j == 0))
        def _():
            sum_ref[:] = part

        @pl.when((bb > 0) | (j > 0))
        def _():
            sum_ref[:] = sum_ref[:] + part

    in_specs = _nbr_in_specs(chunk, wp, cin, n_chunks)
    if has_expand:
        in_specs += [_wspec((cin, ch)), _wspec((1, ch)), _wspec((1, ch))]
    in_specs += [_wspec((9, ch)), _wspec((1, ch)), _wspec((1, ch))]
    in_specs += [_wspec((ch, cout))]

    return pl.pallas_call(
        body,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, chunk, w, cout), lambda bb, j: (bb, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cout), dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_stats(shape, ch, has_expand, act_mid, dtype_name, interpret):
    """Train phase-A kernel: (Σ, Σ²) channel sums of the depthwise conv
    output (pre-BN), for the depthwise-BN batch statistics."""
    b, h, wp, cin = shape
    w = wp - 2
    chunk = _chunk_of(h, 28)
    n_chunks = h // chunk

    def body(*refs):
        i = 0
        xp_ref, xc_ref, xn_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        we_ref = s1_ref = t1_ref = None
        if has_expand:
            we_ref, s1_ref, t1_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
        wd_ref = refs[i]
        i += 1
        sum_ref = refs[i]

        bb = pl.program_id(0)
        j = pl.program_id(1)
        xw = _assemble_rows(xp_ref[0], xc_ref[0], xn_ref[0], chunk)
        mask = _mask(chunk, wp, h, j)
        u1 = _hidden(xw, we_ref,
                     s1_ref[:] if s1_ref is not None else None,
                     t1_ref[:] if t1_ref is not None else None,
                     mask, act_mid, chunk, wp)
        acc = _dw(u1, wd_ref, chunk, w)
        part = jnp.stack([jnp.sum(acc, axis=(0, 1)),
                          jnp.sum(acc * acc, axis=(0, 1))])

        @pl.when((bb == 0) & (j == 0))
        def _():
            sum_ref[:] = part

        @pl.when((bb > 0) | (j > 0))
        def _():
            sum_ref[:] = sum_ref[:] + part

    in_specs = _nbr_in_specs(chunk, wp, cin, n_chunks)
    if has_expand:
        in_specs += [_wspec((cin, ch)), _wspec((1, ch)), _wspec((1, ch))]
    in_specs += [_wspec((9, ch))]

    return pl.pallas_call(
        body,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, ch), lambda bb, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ch), jnp.float32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# XLA-side wrappers
# ---------------------------------------------------------------------------


def _colpad(x):
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))


def _row2(v):
    return v.astype(jnp.float32).reshape(1, -1)


def mbconv_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, *,
                 residual, act_mid="relu6", act_out="none",
                 interpret=False):
    """Whole inverted-residual block with folded (inference) BN.

    x: (B,H,W,Cin) NHWC; we: (Cin,Ch) or None; wd: (3,3,1,Ch) or
    (9,Ch); wpj: (Ch,Cout); s*/t* fp32 per-channel scale/shift
    (γ/√(σ²+ε) and β−μ·scale). stride-1 3×3 depthwise only.
    """
    b, h, w, cin = x.shape
    ch = wd.shape[-1]
    cout = wpj.shape[-1]
    xp = _colpad(x)
    call = _build_full((b, h, w + 2, cin), ch, cout, we is not None,
                       residual, act_mid, act_out, str(x.dtype), interpret)
    args = [xp, xp, xp]
    if we is not None:
        args += [we.astype(x.dtype), _row2(s1), _row2(t1)]
    args += [wd.reshape(9, ch).astype(jnp.float32), _row2(s2), _row2(t2)]
    args += [wpj.reshape(ch, cout).astype(x.dtype), _row2(s3), _row2(t3)]
    return call(*args)


def _finalize(sums, n):
    mean = sums[0] / n
    var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
    return mean, var


def _fold(gamma, beta, mean, var, eps):
    s = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    t = beta.astype(jnp.float32) - mean * s
    return s, t


def _gram_stats(x, we):
    """Expand-BN batch moments without materializing h = x@we:
    Σh = (Σx)@we and Σh² = diag(weᵀ(XᵀX)we)."""
    b, h, w, cin = x.shape
    n = b * h * w
    xf = x.reshape(n, cin)
    we32 = we.astype(jnp.float32)
    sx = jnp.sum(xf.astype(jnp.float32), axis=0)
    gram = jax.lax.dot_general(xf, xf, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    m = gram @ we32                      # (Cin, Ch)
    ex2 = jnp.sum(we32 * m, axis=0) / n  # diag(weᵀ G we)/N
    mean = (sx @ we32) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    return mean, var


def mbconv_train_forward(x, we, g1, b1, wd, g2, b2, wpj, g3, b3, *,
                         eps=1e-5, residual=True, act_mid="relu6",
                         act_out="none", axis_name=None,
                         interpret=False):
    """Training-mode fused forward. Returns (out, stats) where stats is
    ((mean1, var1), (mean2, var2), (mean3, var3)) batch moments (None
    entries when there is no expand stage) for the layer's running-stat
    updates. Differentiable via mbconv_train (custom VJP)."""
    b, h, w, cin = x.shape
    ch = wd.shape[-1]
    cout = wpj.shape[-1]
    n = b * h * w
    xp = _colpad(x)
    dt = str(x.dtype)
    shape = (b, h, w + 2, cin)

    def pmean2(mean, ex_or_var):
        if axis_name is None:
            return mean, ex_or_var
        return (jax.lax.pmean(mean, axis_name),
                jax.lax.pmean(ex_or_var, axis_name))

    if we is not None:
        mean1, var1 = _gram_stats(x, we)
        if axis_name is not None:
            # sync-BN: average sufficient statistics across replicas
            ex2 = var1 + mean1 * mean1
            mean1, ex2 = pmean2(mean1, ex2)
            var1 = jnp.maximum(ex2 - mean1 * mean1, 0.0)
        s1, t1 = _fold(g1, b1, mean1, var1, eps)
        stats1 = (mean1, var1)
    else:
        s1 = t1 = None
        stats1 = None

    wd9 = wd.reshape(9, ch).astype(jnp.float32)
    stats_call = _build_stats(shape, ch, we is not None, act_mid, dt,
                              interpret)
    args = [xp, xp, xp]
    if we is not None:
        args += [we.astype(x.dtype), _row2(s1), _row2(t1)]
    sums2 = stats_call(*args, wd9)
    if axis_name is not None:
        sums2 = jax.lax.psum(sums2, axis_name)
        n2 = n * jax.lax.axis_size(axis_name)
    else:
        n2 = n
    mean2, var2 = _finalize(sums2, n2)
    s2, t2 = _fold(g2, b2, mean2, var2, eps)

    raw_call = _build_raw(shape, ch, cout, we is not None, act_mid, dt,
                          interpret)
    h3, sums3 = raw_call(*args, wd9, _row2(s2), _row2(t2),
                         wpj.reshape(ch, cout).astype(x.dtype))
    if axis_name is not None:
        sums3 = jax.lax.psum(sums3, axis_name)
    mean3, var3 = _finalize(sums3, n2)
    s3, t3 = _fold(g3, b3, mean3, var3, eps)
    y = h3.astype(jnp.float32) * s3 + t3
    if residual:
        y = y + x.astype(jnp.float32)
    y = _act(y, act_out)
    return y.astype(x.dtype), (stats1, (mean2, var2), (mean3, var3))


# ---------------------------------------------------------------------------
# Reference (unfused) composition — the gradient's definition
# ---------------------------------------------------------------------------


def _bn_train_apply(v, gamma, beta, eps, axis_name):
    v32 = v.astype(jnp.float32)
    mean = jnp.mean(v32, axis=tuple(range(v.ndim - 1)))
    ex2 = jnp.mean(v32 * v32, axis=tuple(range(v.ndim - 1)))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        ex2 = jax.lax.pmean(ex2, axis_name)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    s = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (v32 - mean) * s + beta.astype(jnp.float32)


def _unfused(x, we, g1, b1, wd, g2, b2, wpj, g3, b3, *,
             eps, residual, act_mid, act_out, axis_name):
    b, h, w, cin = x.shape
    ch = wd.shape[-1]
    v = x
    if we is not None:
        h1 = jnp.einsum("bhwc,cd->bhwd", x, we.astype(x.dtype),
                        preferred_element_type=jnp.float32)
        v = _act(_bn_train_apply(h1, g1, b1, eps, axis_name),
                 act_mid).astype(x.dtype)
    h2 = jax.lax.conv_general_dilated(
        v, wd.reshape(3, 3, 1, ch).astype(v.dtype), (1, 1),
        ((1, 1), (1, 1)), feature_group_count=ch,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    u2 = _act(_bn_train_apply(h2, g2, b2, eps, axis_name),
              act_mid).astype(x.dtype)
    h3 = jnp.einsum("bhwc,cd->bhwd", u2,
                    wpj.reshape(ch, -1).astype(x.dtype),
                    preferred_element_type=jnp.float32)
    y = _bn_train_apply(h3, g3, b3, eps, axis_name)
    if residual:
        y = y + x.astype(jnp.float32)
    return _act(y, act_out).astype(x.dtype)


# ---------------------------------------------------------------------------
# custom-VJP training op
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_train_op(has_expand, eps, residual, act_mid, act_out, axis_name,
                   interpret):
    kw = dict(eps=eps, residual=residual, act_mid=act_mid,
              act_out=act_out, axis_name=axis_name)

    @jax.custom_vjp
    def op(x, we, g1, b1, wd, g2, b2, wpj, g3, b3):
        return mbconv_train_forward(
            x, we if has_expand else None, g1, b1, wd, g2, b2, wpj, g3,
            b3, interpret=interpret, **kw)

    def fwd(x, we, g1, b1, wd, g2, b2, wpj, g3, b3):
        out = op(x, we, g1, b1, wd, g2, b2, wpj, g3, b3)
        return out, (x, we, g1, b1, wd, g2, b2, wpj, g3, b3)

    def bwd(res, cot):
        x, we, g1, b1, wd, g2, b2, wpj, g3, b3 = res
        dy = cot[0].astype(x.dtype)  # stats cotangents are zero (state
        #                              updates are not differentiated)

        def f(x, we, g1, b1, wd, g2, b2, wpj, g3, b3):
            return _unfused(x, we if has_expand else None, g1, b1, wd,
                            g2, b2, wpj, g3, b3, **kw)

        _, vjp = jax.vjp(f, x, we, g1, b1, wd, g2, b2, wpj, g3, b3)
        return vjp(dy)

    op.defvjp(fwd, bwd)
    return op


def mbconv_train(x, we, g1, b1, wd, g2, b2, wpj, g3, b3, *,
                 eps=1e-5, residual=True, act_mid="relu6", act_out="none",
                 axis_name=None, interpret=False):
    """Differentiable fused training block. Forward runs the Pallas
    kernels; backward recomputes through the unfused XLA composition
    (exact gradients of the block's mathematical definition). When
    there is no expand stage pass ``we=g1=b1=None``; dummy zeros are
    threaded so the custom-VJP signature stays static."""
    has_expand = we is not None
    if not has_expand:
        we = jnp.zeros((x.shape[-1], wd.shape[-1]), x.dtype)
        g1 = jnp.zeros((wd.shape[-1],), jnp.float32)
        b1 = jnp.zeros((wd.shape[-1],), jnp.float32)
    op = _make_train_op(has_expand, float(eps), bool(residual), act_mid,
                        act_out, axis_name, interpret)
    return op(x, we, g1, b1, wd, g2, b2, wpj, g3, b3)


def supported(stride, kernel, dilation=1):
    st = stride if isinstance(stride, tuple) else (stride, stride)
    k = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    dl = dilation if isinstance(dilation, tuple) else (dilation, dilation)
    return st == (1, 1) and k == (3, 3) and dl == (1, 1)
