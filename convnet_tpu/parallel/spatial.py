"""Spatial partitioning — sharding activation HEIGHT across the mesh.

The reference domain has no sequence dimension, so sequence/context
parallelism is N/A (SURVEY.md §5.7); its TPU-native analog is
partitioning the convolution's spatial extent over devices. This module
implements it: activations (B, H, W, C) carry H/n rows per device on a
``'spatial'`` mesh axis, convolutions/poolings exchange **halo rows**
with their mesh neighbors via ``lax.ppermute`` (riding ICI), BatchNorm
moments and global pooling reduce over the spatial axis, and weight
gradients ``psum`` over it. Enables activation footprints (large batch
× high resolution) beyond one chip's HBM.

Halo arithmetic for a k×k conv, stride s, padding p, local height HL
(requires HL % s == 0 and shard-aligned rows):
  local output rows o ∈ [0, HL/s) read input rows [s·o − p, s·o − p + k)
  → halo_up = p rows from the previous shard, halo_down = k − s − p
  rows from the next (clamped ≥ 0; boundary shards zero-pad instead).

Used via ``Context.spatial_axis`` inside ``shard_map`` (nn layers route
here), or directly through :func:`conv2d_spatial` /
:func:`max_pool2d_spatial`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def halo_pad_rows(x, axis_name: str, up: int, down: int, fill=0.0):
    """Concatenate ``up`` rows from the previous spatial shard and
    ``down`` rows from the next onto x (B, HL, W, C); boundary shards
    get ``fill`` instead (zero-padding semantics)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    if up > 0:
        prev_rows = lax.ppermute(
            x[:, -up:], axis_name, [(j, (j + 1) % n) for j in range(n)])
        prev_rows = jnp.where(idx == 0,
                              jnp.full_like(prev_rows, fill), prev_rows)
        parts.append(prev_rows)
    parts.append(x)
    if down > 0:
        next_rows = lax.ppermute(
            x[:, :down], axis_name, [(j, (j - 1) % n) for j in range(n)])
        next_rows = jnp.where(idx == n - 1,
                              jnp.full_like(next_rows, fill), next_rows)
        parts.append(next_rows)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def conv_halos(kernel_h: int, stride_h: int, pad_h: int):
    up = pad_h
    down = max(kernel_h - stride_h - pad_h, 0)
    return up, down


def _gather_compute_slice(x, axis_name, compute_full):
    """Fallback for halos wider than the local shard (tiny late-stage
    activations): all-gather the full height, compute locally, slice
    this shard's output rows back out. O(full tensor) but only fires
    when H_local is a few rows."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    full = lax.all_gather(x, axis_name, axis=1, tiled=True)
    y_full = compute_full(full)
    o_per = y_full.shape[1] // n
    return lax.dynamic_slice_in_dim(y_full, i * o_per, o_per, axis=1)


def conv2d_spatial(x, w, *, stride=1, padding=0, dilation=1, groups=1,
                   axis_name: str = "spatial"):
    """NHWC conv with H sharded over ``axis_name`` (inside shard_map)."""
    from convnet_tpu import ops
    assert dilation in (1, (1, 1)), "spatial sharding: dilation unsupported"
    sh, _sw = _pair(stride)
    kh = w.shape[0]
    ph, pw = _pair(padding)
    if x.shape[1] % sh:
        raise ValueError("spatial sharding requires local H divisible by "
                         f"stride ({x.shape[1]} % {sh})")
    up, down = conv_halos(kh, sh, ph)
    if max(up, down) > x.shape[1]:
        return _gather_compute_slice(
            x, axis_name,
            lambda full: ops.conv2d(full, w, stride=stride,
                                    padding=((ph, ph), (pw, pw)),
                                    groups=groups))
    xh = halo_pad_rows(x, axis_name, up, down)
    # height already materialized (halo + interior): VALID on H, pad W only
    return ops.conv2d(xh, w, stride=stride,
                      padding=((0, 0), (pw, pw)), groups=groups)


def max_pool2d_spatial(x, kernel, stride=None, padding=0,
                       axis_name: str = "spatial"):
    from convnet_tpu import ops
    stride = stride if stride is not None else kernel
    kh, _kw = _pair(kernel)
    sh, _sw = _pair(stride)
    ph, pw = _pair(padding)
    up, down = conv_halos(kh, sh, ph)
    if max(up, down) > x.shape[1]:
        return _gather_compute_slice(
            x, axis_name,
            lambda full: ops.max_pool2d(full, kernel, stride, (ph, pw)))
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xh = halo_pad_rows(x, axis_name, up, down, fill=neg)
    # H halos are in place → pool with W-only padding. ops.max_pool2d
    # takes symmetric int padding; pad W explicitly instead.
    if pw:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (pw, pw), (0, 0)),
                     constant_values=neg)
    return ops.max_pool2d(xh, kernel, stride, 0)


def avg_pool2d_spatial(x, kernel, stride=None, padding=0,
                       axis_name: str = "spatial", count_include_pad=True):
    """Average pooling with halo rows. Zero-fill halos at true edges
    reproduce count_include_pad=True semantics directly; for
    count_include_pad=False (Cadene/timm Inception-v4/-ResNet-v2
    branch pools) the exact in-bounds tap count per window is computed
    arithmetically from the shard's global row offset (no neighbor
    exchange — see inline note) and divided out."""
    from convnet_tpu import ops
    stride = stride if stride is not None else kernel
    kh, _kw = _pair(kernel)
    sh, _sw = _pair(stride)
    ph, pw = _pair(padding)
    up, down = conv_halos(kh, sh, ph)
    if max(up, down) > x.shape[1]:
        return _gather_compute_slice(
            x, axis_name,
            lambda full: ops.avg_pool2d(full, kernel, stride, (ph, pw),
                                        count_include_pad=count_include_pad))
    xh = halo_pad_rows(x, axis_name, up, down, fill=0.0)
    if pw:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    y = ops.avg_pool2d(xh, kernel, stride, 0)
    if count_include_pad:
        return y
    # In-bounds tap counts are pure arithmetic on the shard's global
    # row offset — no neighbor exchange (an earlier version ppermuted a
    # ones-mask through halo_pad_rows; the mask is data-independent, so
    # that spent ICI latency per pool per step for nothing): haloed row
    # r sits at global row i·HL − up + r and is in-bounds iff
    # 0 ≤ g < n·HL; W taps are in-bounds except the explicit zero pad.
    # Include-pad pool of the mask = tap_count/(kh·kw), so y/cnt is
    # exactly window_sum/tap_count.
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    hl = x.shape[1]
    g = i * hl - up + jnp.arange(hl + up + down)
    rows = ((g >= 0) & (g < n * hl)).astype(jnp.float32)
    cols = jnp.pad(jnp.ones((x.shape[2],), jnp.float32), (pw, pw))
    mask = (rows[:, None] * cols[None, :])[None, :, :, None]
    cnt = jax.lax.stop_gradient(ops.avg_pool2d(mask, kernel, stride, 0))
    return (y.astype(jnp.float32) / jnp.maximum(cnt, 1e-12)).astype(x.dtype)


def flatten_spatial(x, axis_name: str = "spatial"):
    """(B, HL, W, C) → (B, H·W·C): gather the full height across
    spatial shards (tiled all_gather), then flatten — used by
    flatten-classifier heads (VGG/AlexNet) under spatial sharding. The
    result is replicated, so the head's grads follow the
    replicated-region convention (spatial_grad_reduce)."""
    full = lax.all_gather(x, axis_name, axis=1, tiled=True)
    return full.reshape(full.shape[0], -1)


def global_avg_pool_spatial(x, axis_name: str = "spatial", keepdims=False):
    """Mean over (local H, W) then over spatial shards (equal shards).
    Gradient-paired pmean: the consumer (classifier head) is replicated,
    so backward divides the (already exact) cotangent by the shard
    count."""
    local = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return pmean_paired(local, axis_name).astype(x.dtype)


def _make_pmean_paired(axis_name):
    """pmean whose backward is ct/n.

    Under shard_map, stock ``lax.pmean``'s VJP passes the cotangent
    through UNSCALED (it transposes like psum — measured empirically on
    jax 0.9), which overcounts by the axis size when the consumer is
    replicated. This pair maintains the invariant "cotangents are exact
    total derivatives" across the sharded→replicated boundary.
    """

    @jax.custom_vjp
    def op(x):
        return lax.pmean(x, axis_name)

    def fwd(x):
        return lax.pmean(x, axis_name), None

    def bwd(_, ct):
        n = lax.axis_size(axis_name)
        return (jax.tree_util.tree_map(lambda t: t / n, ct),)

    op.defvjp(fwd, bwd)
    return op


def _make_replicated_use(axis_name):
    """Identity whose backward psums the cotangent — marks a replicated
    value consumed by SHARDED computation, so its per-shard partial
    cotangents are summed into the exact total (the other half of the
    invariant above)."""

    @jax.custom_vjp
    def op(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, ct):
        return (jax.tree_util.tree_map(
            lambda t: lax.psum(t, axis_name), ct),)

    op.defvjp(fwd, bwd)
    return op


def _make_replicated_use_mean(axis_name):
    """Identity whose backward pmeans the cotangent: marks a replicated
    value consumed by sharded computation inside a TRUNK subgraph whose
    parameter grads follow the exact-PARTIAL (psum-at-the-end)
    convention — the resulting cotangents are exact/n, so a final psum
    over the axis restores totals (see nn/se.py for the worked case)."""

    @jax.custom_vjp
    def op(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, ct):
        return (jax.tree_util.tree_map(
            lambda t: lax.pmean(t, axis_name), ct),)

    op.defvjp(fwd, bwd)
    return op


def _make_grad_scale(axis_name):
    """Identity whose backward multiplies the cotangent by the axis
    size — converts exact/n cotangents back to exact at a boundary."""

    @jax.custom_vjp
    def op(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, ct):
        n = lax.axis_size(axis_name)
        return (jax.tree_util.tree_map(lambda t: t * n, ct),)

    op.defvjp(fwd, bwd)
    return op


def pmean_paired(x, axis_name: str):
    return _make_pmean_paired(axis_name)(x)


def replicated_use(x, axis_name: str):
    return _make_replicated_use(axis_name)(x)


def replicated_use_mean(x, axis_name: str):
    return _make_replicated_use_mean(axis_name)(x)


def grad_scale_by_axis(x, axis_name: str):
    return _make_grad_scale(axis_name)(x)


def spatial_grad_reduce(grads, axis_name: str = "spatial",
                        replicated_keys=("fc", "classifier")):
    """Reduce parameter gradients over the spatial axis.

    Two gradient flavors exist under spatial sharding:
    - params UPSTREAM of the global pooling see sharded activations →
      each shard holds a *partial* gradient → ``psum``;
    - params DOWNSTREAM of the pooling (the classifier head) compute on
      replicated activations with replicated cotangents → each shard
      already holds the *full* gradient → ``psum`` would overcount by
      the shard count, so those subtrees are left as-is.

    ``replicated_keys``: top-level param-tree keys of the replicated
    head region (every zoo model names its head 'fc' or 'classifier').
    """
    n = lax.axis_size(axis_name)
    del n

    def reduce_tree(tree, replicated):
        if isinstance(tree, dict):
            return {k: reduce_tree(v, replicated or k in replicated_keys)
                    for k, v in tree.items()}
        return tree if replicated else lax.psum(tree, axis_name)

    return reduce_tree(grads, False)
