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

import os

import numpy as np

import jax
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


def _mp_fwd_argmax(x, kernel, stride, padding):
    """One pass over padded x via strided slices: (out, argmax tap idx).

    First-match tie-breaking (strict `>` update) matches torch/cudnn's
    single-winner gradient routing.
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x.shape
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg)
    out = None
    idx = None
    for di in range(kh):
        for dj in range(kw):
            t = di * kw + dj
            patch = jax.lax.slice(
                xp, (0, di, dj, 0),
                (b, di + (h_out - 1) * sh + 1, dj + (w_out - 1) * sw + 1, c),
                (1, sh, sw, 1))
            if out is None:
                out = patch
                idx = jnp.zeros(patch.shape, jnp.uint8)
            else:
                better = patch > out
                out = jnp.where(better, patch, out)
                idx = jnp.where(better, jnp.uint8(t), idx)
    return out, idx


def _mp_fwd_reduce_window(x, kernel, stride, padding):
    """Max-pool forward via ``lax.reduce_window`` — the clean lowering
    on the axon TPU backend (the strided-slice formulation above
    MISCOMPILES there when fused between convs; see
    _erratum_class / scripts/PERF_NOTES.md session 22). Used as
    the custom_vjp primal so eval/inference graphs contain no window
    slices at all; reduce_window's own (slow/unsupported) VJP is never
    taken — the custom backward below replaces it."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
        [(0, 0), (ph, ph), (pw, pw), (0, 0)])


def _mp_idx_from_out(x, out, kernel, stride, padding):
    """Winning-tap index recovered by comparing each window tap to the
    max: iterate taps in REVERSE so the final write is the first
    matching tap (same first-match tie-breaking as _mp_fwd_argmax /
    torch)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x.shape
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                 constant_values=neg)
    idx = jnp.zeros(out.shape, jnp.uint8)
    for t in range(kh * kw - 1, -1, -1):
        di, dj = divmod(t, kw)
        patch = jax.lax.slice(
            xp, (0, di, dj, 0),
            (b, di + (h_out - 1) * sh + 1, dj + (w_out - 1) * sw + 1, c),
            (1, sh, sw, 1))
        idx = jnp.where(patch == out, jnp.uint8(t), idx)
    return idx


def _interleave(planes, period, axis, target_len, crop_lo):
    """Given ``period`` per-residue planes (same shape), interleave along
    ``axis`` so plane r element b lands at coordinate period*b + r, then
    crop [crop_lo : crop_lo+target_len]."""
    stacked = jnp.stack(planes, axis=axis + 1)  # (..., L, period, ...)
    shape = list(stacked.shape)
    shape[axis:axis + 2] = [shape[axis] * shape[axis + 1]]
    merged = stacked.reshape(shape)
    length = merged.shape[axis]
    if length < crop_lo + target_len:
        pad = [(0, 0)] * merged.ndim
        pad[axis] = (0, crop_lo + target_len - length)
        merged = jnp.pad(merged, pad)
    sl = [slice(None)] * merged.ndim
    sl[axis] = slice(crop_lo, crop_lo + target_len)
    return merged[tuple(sl)]


def _shift_pad(x, axis, lo, hi):
    """Pad ``lo`` before / ``hi`` after along axis (block-shift)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(x, pad)


def _shift2(m, du, dv, n_h, n_w):
    """out[a, b] = m[a + du, b + dv] over a ∈ [0, n_h), b ∈ [0, n_w)
    with zero fill for out-of-range reads (du/dv may be negative);
    static offsets, rank-4 [NB, H, W, C] values.

    The exactness-critical core of every residue-class pad-sum backward
    (``_mp_bwd_padsum``/``_ap_bwd_padsum`` here and the Pallas kernel in
    ops/pallas/pool_bwd.py) — single-sourced so the pad/slice arithmetic
    cannot diverge between formulations. Only guarded ``lax.pad`` +
    ``lax.slice`` (Mosaic-compatible; jobs 033/035)."""
    pad = [(0, 0)] * 4
    start = [0, 0, 0, 0]
    for axis, (d, n) in ((1, (du, n_h)), (2, (dv, n_w))):
        lo = max(0, -d)
        hi = max(0, n + d - m.shape[axis])
        pad[axis] = (lo, hi)
        start[axis] = d + lo
    if any(p != (0, 0) for p in pad):
        m = jax.lax.pad(m, jnp.zeros((), m.dtype),
                        [(p[0], p[1], 0) for p in pad])
    return jax.lax.slice(
        m, start, [start[0] + m.shape[0], start[1] + n_h,
                   start[2] + n_w, start[3] + m.shape[3]])


def _class_taps(r, p, k, s):
    """Taps d feeding residue class r (unpadded coords): d ≡ (r+p) mod
    s, window shift u = (r+p-d)//s."""
    return [(d, (r + p - d) // s) for d in range(k) if (r + p - d) % s == 0]


def _mp_bwd(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    """Scatter-free max-pool backward: decompose the strided scatter by
    residue classes and reassemble with interleaving reshapes — all
    elementwise ops and pads, fully fusable on TPU (no select-and-scatter,
    which XLA lowers poorly on this backend)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x_shape
    # The pass is HBM-bandwidth-bound; accumulate in dy's own dtype.
    # Each dx element receives at most ceil(k/s)² routed terms (4 for
    # 3×3/2), and argmax routing is dtype-exact, so bf16 training gets
    # a bf16 backward at half the traffic (measured −8 ms on the RN50
    # step, scripts/tpu_bench15_results.txt); fp32 stays fp32.
    qw = (kw - 1) // sw
    row_terms = []
    for di in range(kh):
        col_planes = []
        for rc in range(sw):
            acc = None
            for dj in range(rc, kw, sw):
                contrib = dy * (idx == jnp.uint8(di * kw + dj)).astype(dy.dtype)
                shifted = _shift_pad(contrib, 2, dj // sw, qw - dj // sw)
                acc = shifted if acc is None else acc + shifted
            col_planes.append(acc if acc is not None
                              else jnp.zeros(_shift_pad(dy, 2, 0, qw).shape,
                                             dy.dtype))
        row_terms.append(_interleave(col_planes, sw, 2, w, pw))

    # --- rows: same decomposition over di
    qh = (kh - 1) // sh
    row_planes = []
    for rr in range(sh):
        acc = None
        for di in range(rr, kh, sh):
            shifted = _shift_pad(row_terms[di], 1, di // sh, qh - di // sh)
            acc = shifted if acc is None else acc + shifted
        row_planes.append(acc if acc is not None
                          else jnp.zeros(_shift_pad(row_terms[0], 1, 0, qh).shape,
                                         dy.dtype))
    dx = _interleave(row_planes, sh, 1, h, ph)
    return dx.astype(x_dtype)


def _mp_bwd_padsum(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    """Max-pool backward, residue-class pad-sum formulation.

    For input coordinate i = s*a + r (residue r), the windows covering
    it are oi = a + u for each tap di with di ≡ (r+p) (mod s),
    u = (r + p - di)/s — so each residue class (rr, rc) of dx is a sum
    of ≤⌈k/s⌉² *shifted* masked-dy planes at the OUTPUT resolution, and
    dx itself is assembled by placing each class at its strided
    positions via ``lax.pad`` interior (dilation) padding.

    Unlike the stack+reshape interleave (``_mp_bwd_interleave``), this
    graph is only slices, pads, selects and adds — no dimension-merging
    reshapes, which lower to sublane shuffles on TPU and dominate that
    formulation's cost (scripts/PERF_NOTES.md session 23b: 15.8 →
    measured vs this). XLA fuses pads into the consuming add loop.
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x_shape

    dx = None
    for rr in range(sh):
        # unpadded row i = sh*a + rr receives tap di at oi = a + du
        rtaps = _class_taps(rr, ph, kh, sh)
        n_h = (h - rr + sh - 1) // sh  # number of rows in this class
        if n_h <= 0 or not rtaps:
            continue
        for rc in range(sw):
            ctaps = _class_taps(rc, pw, kw, sw)
            n_w = (w - rc + sw - 1) // sw
            if n_w <= 0 or not ctaps:
                continue
            plane = None
            for di, du in rtaps:
                for dj, dv in ctaps:
                    t = di * kw + dj
                    m = dy * (idx == jnp.uint8(t)).astype(dy.dtype)
                    m = _shift2(m, du, dv, n_h, n_w)
                    plane = m if plane is None else plane + m
            if (sh, sw) == (1, 1):
                # single residue class covers dx entirely — a strided
                # set would lower to a real scatter (measured 2.5 ms on
                # the GoogLeNet branch pools, profile_gln session 29d)
                return plane.astype(x_dtype)
            # place plane element (a, b) at (sh*a + rr, sw*b + rc):
            # strided .at[].set measured 2x faster than interior-pad
            # placement on this backend (scripts/tpu_bench25_results:
            # 4.66 vs 9.81 ms at the RN50 stem shape); residue classes
            # are disjoint so plain .set is exact.
            if dx is None:
                dx = jnp.zeros((b, h, w, c), dy.dtype)
            dx = dx.at[:, rr::sh, rc::sw, :].set(plane)
    if dx is None:
        dx = jnp.zeros((b, h, w, c), dy.dtype)
    return dx.astype(x_dtype)


_mp_bwd_interleave = _mp_bwd


def _select_mp_bwd(bwd_kind):
    """Backward formulation switch (scripts/PERF_NOTES.md sessions
    23c-25): the pad-sum residue-class formulation with strided
    ``.at[].set`` placement wins at every measured config — RN50 stem
    3/2/1 standalone 12.5 → 7.4 ms (step +5%), GoogLeNet step +14%,
    and VGG's non-overlapping 2/2/0 pools 1115 → 1156 img/s (the
    earlier interior-pad placement lost there; strided-set does not).
    The interleave formulation is kept for A/B under
    CONVNET_TPU_POOL_BWD=interleave; CONVNET_TPU_POOL_BWD=pallas routes
    the masked-sum + residue placement through the fused VMEM kernel
    (ops/pallas/pool_bwd.py). ``bwd_kind`` is resolved from the env at
    the ``max_pool2d`` call site so it participates in the lru_cache
    key (flipping the flag mid-process takes effect)."""
    if bwd_kind == "interleave":
        return _mp_bwd_interleave
    if bwd_kind == "pallas":
        return _mp_bwd_pallas
    return _mp_bwd_padsum


def _mp_bwd_pallas(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    from convnet_tpu.ops.pallas import pool_bwd as pb
    if not pb.supported(kernel, stride, padding, x_shape, dy.dtype):
        return _mp_bwd_padsum(kernel, stride, padding, x_shape, x_dtype,
                              idx, dy)
    interpret = jax.devices()[0].platform == "cpu"
    return pb.max_pool2d_bwd_pallas(kernel, stride, padding, x_shape,
                                    x_dtype, idx, dy, interpret=interpret)


from functools import lru_cache


def _axis_max_fwd(xp, axis, k, s, out_len):
    """1-D max over windows of ``k`` stride ``s`` along ``axis`` of the
    already-padded input, tracking the winning tap (first-match)."""
    out = None
    idx = None
    for t in range(k):
        sl = [slice(None)] * xp.ndim
        sl[axis] = slice(t, t + (out_len - 1) * s + 1, s)
        patch = xp[tuple(sl)]
        if out is None:
            out = patch
            idx = jnp.zeros(patch.shape, jnp.uint8)
        else:
            better = patch > out
            out = jnp.where(better, patch, out)
            idx = jnp.where(better, jnp.uint8(t), idx)
    return out, idx


def _axis_max_bwd(axis, k, s, pad, in_len, idx, dy):
    """Scatter dy back through a 1-D max: residue-class interleave
    along ``axis`` (same machinery as the 2-D backward, one axis)."""
    q = (k - 1) // s
    planes = []
    for r in range(s):
        acc = None
        for t in range(r, k, s):
            contrib = dy * (idx == jnp.uint8(t)).astype(dy.dtype)
            shifted = _shift_pad(contrib, axis, t // s, q - t // s)
            acc = shifted if acc is None else acc + shifted
        planes.append(acc if acc is not None
                      else jnp.zeros(_shift_pad(dy, axis, 0, q).shape,
                                     dy.dtype))
    return _interleave(planes, s, axis, in_len, pad)


@lru_cache(maxsize=None)
def _make_max_pool_separable(kernel, stride, padding, x_shape, dtype_name):
    """Separable max pool: max over a k×k window = rowmax(colmax).

    MEASURED SLOWER on v5e (scripts/tpu_bench18_results.txt: fwd 16.3
    vs 3.3 ms, fwd+bwd 26.4 vs 15.6 at the RN50 stem shape) — XLA
    fuses the 2-D version's nine strided window reads into one loop
    with no materialization, while this version materializes the
    column-stage intermediate in a different geometry and pays real
    relayouts. Kept gated off (CONVNET_TPU_SEPARABLE_POOL=1) for
    backends whose window fusion is weaker. Tie-breaking is per-axis
    first-match (single-winner like torch; flat-order may differ from
    2-D first-match only on exact ties, common in bf16).
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x_shape
    h_out = _out_size(h, kh, sh, ph)
    w_out = _out_size(w, kw, sw, pw)
    neg = -jnp.inf

    def _fwd_core(x):
        xp = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)),
                     constant_values=neg)
        colmax, colidx = _axis_max_fwd(xp, 1, kh, sh, h_out)
        cp = jnp.pad(colmax, ((0, 0), (0, 0), (pw, pw), (0, 0)),
                     constant_values=neg)
        out, rowidx = _axis_max_fwd(cp, 2, kw, sw, w_out)
        return out, colidx, rowidx

    @jax.custom_vjp
    def mp(x):
        return _fwd_core(x)[0]

    def fwd(x):
        out, colidx, rowidx = _fwd_core(x)
        return out, (colidx, rowidx)

    def bwd(res, dy):
        colidx, rowidx = res
        d_colmax = _axis_max_bwd(2, kw, sw, pw, w, rowidx, dy)
        dx = _axis_max_bwd(1, kh, sh, ph, h, colidx, d_colmax)
        return (dx,)

    mp.defvjp(fwd, bwd)
    return mp


def _erratum_class(stride, padding):
    """Axon slice-fusion erratum classifier (scripts/PERF_NOTES.md
    session 22): the strided-slice max-pool formulation MISCOMPILES on
    the axon TPU backend when fused between convs (deterministic
    structured NaNs in the top-left rows/cols, params-independent,
    CPU-clean). Measured trigger: pool stride>1 AND pad>0; the NaN'ing
    size depends on dtype/fusion context (fp32 isolated chains bad at
    out ≤32², bf16 GoogLeNet stem bad at 56²), so no size threshold is
    safe — every strided+padded pool uses the reduce_window-primal
    formulation. Stride-1 and pad-0 pools (inception branch pools,
    AlexNet/VGG/MNIST) measured clean at every size and keep the
    single-chain argmax formulation, which shares the max chain
    between activation and tap index (~20% faster GoogLeNet step).
    CONVNET_TPU_POOL_SAFE=1 forces the safe formulation everywhere."""
    if os.environ.get("CONVNET_TPU_POOL_SAFE") == "1":
        return True
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return max(sh, sw) > 1 and max(ph, pw) > 0


@lru_cache(maxsize=None)
def _make_max_pool(kernel, stride, padding, x_shape, dtype_name,
                   safe=None, bwd_kind=None):
    """custom_vjp specialized per static (config, shape, dtype,
    formulation). ``safe``/``bwd_kind`` are resolved from the env by
    the caller so env-flag flips are honored in-process (they are part
    of the cache key).

    Two forward formulations, selected by ``_erratum_class``:
    - erratum class (stride>1 and pad>0): primal is pure
      ``reduce_window`` (no window slices — immune to the axon
      slice-fusion miscompile, fully fusable); the VJP fwd adds the
      winning-tap index recovered by compare-to-max. The convs consume
      only the reduce_window result; the slice chain feeds nothing but
      the u8 index for the custom backward — gradient parity vs CPU
      verified on-chip at the erratum shapes (PERF_NOTES session 22).
    - otherwise: single argmax slice chain shared between activation
      and index (measured clean at every size for stride-1 and pad-0
      pools, and faster — the max chain is computed once).
    Backward: scatter-free residue interleave either way."""
    if safe is None:
        safe = _erratum_class(stride, padding)

    @jax.custom_vjp
    def mp(x):
        if safe:
            return _mp_fwd_reduce_window(x, kernel, stride, padding)
        return _mp_fwd_argmax(x, kernel, stride, padding)[0]

    def fwd(x):
        if safe:
            out = _mp_fwd_reduce_window(x, kernel, stride, padding)
            idx = _mp_idx_from_out(x, out, kernel, stride, padding)
        else:
            out, idx = _mp_fwd_argmax(x, kernel, stride, padding)
        return out, idx

    bwd_impl = _select_mp_bwd(
        bwd_kind if bwd_kind is not None
        else os.environ.get("CONVNET_TPU_POOL_BWD", ""))

    def bwd(idx, dy):
        return (bwd_impl(kernel, stride, padding, x_shape, dtype_name,
                         idx, dy),)

    mp.defvjp(fwd, bwd)
    return mp


def max_pool2d(x, kernel, stride=None, padding=0, impl="xla"):
    stride = stride if stride is not None else kernel
    kernel = _pair(kernel)
    stride = _pair(stride)
    padding = _pair(padding)
    if impl == "pallas" and os.environ.get("CONVNET_TPU_PALLAS_POOL") == "1":
        # opt-in: measured on v5e (scripts/PERF_NOTES.md), the XLA
        # argmax-forward + interleave-backward below outperforms the
        # Pallas kernels at ResNet scale; the kernels remain available
        # for backends with weak select-and-scatter lowering.
        from convnet_tpu.ops.pallas import pool as ppool
        if ppool.supported(x.shape, kernel, stride, padding):
            interpret = jax.devices()[0].platform == "cpu"
            return ppool.max_pool2d_pallas(x, kernel, stride, padding,
                                           interpret=interpret)
    if os.environ.get("CONVNET_TPU_SEPARABLE_POOL", "0") == "1":
        mp = _make_max_pool_separable(kernel, stride, padding, x.shape,
                                      str(x.dtype))
    else:
        mp = _make_max_pool(
            kernel, stride, padding, x.shape, str(x.dtype),
            _erratum_class(stride, padding),
            os.environ.get("CONVNET_TPU_POOL_BWD", ""))
    return mp(x)


def _ap_counts(kernel, stride, padding, x_shape):
    """Static per-output-position valid-tap counts (numpy, trace-time)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    ones = np.ones((1,) + tuple(x_shape[1:3]) + (1,), np.float32)
    padded = np.pad(ones, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h_out = _out_size(x_shape[1], kh, sh, ph)
    w_out = _out_size(x_shape[2], kw, sw, pw)
    counts = None
    for i in range(kh):
        for j in range(kw):
            sl = padded[:, i:i + h_out * sh:sh, j:j + w_out * sw:sw, :]
            counts = sl if counts is None else counts + sl
    return counts


def _ap_fwd(x, kernel, stride, padding, count_include_pad):
    kh, kw = _pair(kernel)
    acc = None
    for patch in _patches(x, kernel, stride, padding, 0):
        p32 = patch.astype(jnp.float32)
        acc = p32 if acc is None else acc + p32
    if count_include_pad or _pair(padding) == (0, 0):
        out = acc / (kh * kw)
    else:
        out = acc / jnp.asarray(_ap_counts(kernel, stride, padding, x.shape))
    return out.astype(x.dtype)


def _ap_bwd_padsum(kernel, stride, padding, x_shape, x_dtype,
                   count_include_pad, dy):
    """Average-pool backward, residue-class pad-sum with strided-set
    placement (same scheme as ``_mp_bwd_padsum``, uniform routing
    instead of argmax masks). XLA's autodiff of the patch-decomposed
    forward generates a pad-scatter per tap that measured 10-20x off
    bandwidth speed-of-light on this backend (scripts/PERF_NOTES.md
    session 26: 5.74 ms at DenseNet's 28²×256 transition)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, c = x_shape
    if count_include_pad or (ph, pw) == (0, 0):
        dys = dy / np.float32(kh * kw)
    else:
        dys = dy / jnp.asarray(_ap_counts(kernel, stride, padding, x_shape),
                               dy.dtype)
    dys = dys.astype(dy.dtype)

    dx = None
    for rr in range(sh):
        rtaps = [u for _, u in _class_taps(rr, ph, kh, sh)]
        n_h = (h - rr + sh - 1) // sh
        if n_h <= 0 or not rtaps:
            continue
        for rc in range(sw):
            ctaps = [u for _, u in _class_taps(rc, pw, kw, sw)]
            n_w = (w - rc + sw - 1) // sw
            if n_w <= 0 or not ctaps:
                continue
            plane = None
            for du in rtaps:
                for dv in ctaps:
                    m = _shift2(dys, du, dv, n_h, n_w)
                    plane = m if plane is None else plane + m
            if (sh, sw) == (1, 1):
                return plane.astype(x_dtype)  # single class covers dx
            if dx is None:
                dx = jnp.zeros((b, h, w, c), dy.dtype)
            dx = dx.at[:, rr::sh, rc::sw, :].set(plane)
    if dx is None:
        dx = jnp.zeros((b, h, w, c), dy.dtype)
    return dx.astype(x_dtype)


@lru_cache(maxsize=None)
def _make_avg_pool(kernel, stride, padding, count_include_pad, x_shape,
                   dtype_name):
    """custom_vjp avg pool specialized per static (config, shape,
    dtype); forward unchanged (patch-decomposed, fp32 accumulation),
    backward via pad-sum instead of XLA's per-tap pad-scatter."""

    @jax.custom_vjp
    def ap(x):
        return _ap_fwd(x, kernel, stride, padding, count_include_pad)

    def fwd(x):
        return _ap_fwd(x, kernel, stride, padding, count_include_pad), None

    def bwd(_, dy):
        return (_ap_bwd_padsum(kernel, stride, padding, x_shape,
                               dtype_name, count_include_pad, dy),)

    ap.defvjp(fwd, bwd)
    return ap


def avg_pool2d(x, kernel, stride=None, padding=0, count_include_pad=True):
    stride = stride if stride is not None else kernel
    ap = _make_avg_pool(_pair(kernel), _pair(stride), _pair(padding),
                        bool(count_include_pad), x.shape, str(x.dtype))
    return ap(x)


def global_avg_pool(x, keepdims=False):
    """Adaptive-avg-pool-to-1x1 equivalent; fp32 accumulation."""
    out = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return out.astype(x.dtype)
