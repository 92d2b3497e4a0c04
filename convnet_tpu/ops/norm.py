"""Batch normalization as pure functions.

The reference relies on ``torch.nn.BatchNorm2d`` with per-replica batch
statistics (no SyncBatchNorm upstream — SURVEY.md §2.3). Here batch stats
are computed in fp32 over (N, H, W) of the NHWC activation, and
**cross-replica BN** is first-class: pass ``axis_name`` (a mesh axis
inside ``shard_map``) and the batch moments are averaged over the data
axis with ``lax.pmean`` riding ICI (SURVEY.md §2.4).

Running statistics follow torch semantics:
- normalization uses the *biased* batch variance;
- the running-var EMA update uses the *unbiased* variance (n/(n-1));
- ``momentum`` is the torch convention: ``new = (1-m)*old + m*batch``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def _batch_moments(x, axis_name, spatial_axis=None):
    """axis_name: the data mesh axis for cross-replica (sync) BN;
    spatial_axis: the mesh axis H is sharded over (spatial
    partitioning) — reduced with gradient-paired collectives
    (parallel/spatial.py) so backward stays exact."""
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))  # all but channels
    mean = jnp.mean(x32, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
    if spatial_axis is not None:
        from convnet_tpu.parallel.spatial import pmean_paired
        mean = pmean_paired(mean, spatial_axis)
        mean_sq = pmean_paired(mean_sq, spatial_axis)
    if axis_name is not None:
        # cross-replica: average the sufficient statistics over the data axis
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


def batch_norm_train(
    x,
    scale,
    bias,
    running_mean,
    running_var,
    *,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    local_count: Optional[int] = None,
    axis_size: int = 1,
    spatial_axis: Optional[str] = None,
):
    """Training-mode BN. Returns (y, new_running_mean, new_running_var).

    ``local_count`` is the per-replica number of elements reduced per
    channel (N*H*W); with ``axis_name``/``spatial_axis`` the effective
    count is ``local_count * axis_size`` for the unbiased correction.
    """
    mean, var = _batch_moments(x, axis_name, spatial_axis)
    norm_mean, norm_var = mean, var
    if spatial_axis is not None:
        # moments are replicated across spatial shards but consumed by
        # SHARDED normalization — mark so backward psums the partial
        # cotangents into the exact total (parallel/spatial.py)
        from convnet_tpu.parallel.spatial import replicated_use
        norm_mean = replicated_use(mean, spatial_axis)
        norm_var = replicated_use(var, spatial_axis)
    inv = lax.rsqrt(norm_var + eps)
    if scale is not None:
        inv = inv * scale.astype(jnp.float32)
    y = (x.astype(jnp.float32) - norm_mean) * inv
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = y.astype(x.dtype)

    if local_count is None:
        local_count = x.size // x.shape[-1]
    n = local_count * (axis_size if (axis_name is not None
                                     or spatial_axis is not None) else 1)
    correction = n / max(n - 1, 1)
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * (var * correction)
    return y, new_mean, new_var


def batch_norm_inference(x, scale, bias, running_mean, running_var, *,
                         eps: float = 1e-5):
    """Eval-mode BN using running statistics (foldable — utils/absorb_bn)."""
    inv = lax.rsqrt(running_var + eps)
    if scale is not None:
        inv = inv * scale.astype(jnp.float32)
    shift = running_mean * inv
    if bias is not None:
        shift = shift - bias.astype(jnp.float32)
    y = x.astype(jnp.float32) * inv - shift
    return y.astype(x.dtype)
