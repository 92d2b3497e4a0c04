"""ZeRO-1-style optimizer-state sharding over the data axis.

The reference's DDP replicates optimizer state on every GPU; here the
optimizer moments shard across the data-parallel axis and the update
itself is distributed (the ZeRO stage-1 pattern):

  1. per-shard gradients → ``lax.psum_scatter`` (reduce-scatter: each
     device receives the SUM of its 1/n slice — one collective doing
     both the all-reduce and the partitioning; /n for the mean),
  2. each device updates only its slice of the (flattened, padded)
     parameter vector with its slice of the moments,
  3. ``lax.all_gather`` reassembles the updated parameters.

Communication volume matches plain all-reduce (reduce_scatter +
all_gather == all_reduce on a ring) while optimizer memory drops by
the data-parallel degree — relevant for Adam-family training of the
larger zoo members and a building block for bigger-than-chip work.

Everything operates on the flat fp32 vector from
``jax.flatten_util.ravel_pytree`` (padded to a multiple of the axis
size) so per-leaf divisibility never constrains the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


def flat_size(params, n_shards: int) -> int:
    """Padded flat length (multiple of n_shards)."""
    size = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return -(-size // n_shards) * n_shards


def flat_mask01(params, mask_tree, n_shards: int):
    """Flattened 0/1 weight-decay mask, padded (numpy, static)."""
    import numpy as np
    m01 = jax.tree_util.tree_map(
        lambda p, m: np.full(np.shape(p), 1.0 if m else 0.0, np.float32),
        jax.tree_util.tree_map(lambda x: x, params), mask_tree)
    flat = np.concatenate([np.ravel(x) for x in
                           jax.tree_util.tree_leaves(m01)])
    padded = flat_size(params, n_shards)
    return np.pad(flat, (0, padded - flat.shape[0]))


def shard_slice(flat, axis_name: str):
    """This device's slice of a (padded) flat vector."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    per = flat.shape[0] // n
    return lax.dynamic_slice_in_dim(flat, i * per, per)


def reduce_scatter_mean(grads_tree, padded: int, axis_name: str):
    """Gradient pytree → this shard's slice of the mean-reduced flat
    gradient (ONE reduce-scatter collective)."""
    flat, _ = ravel_pytree(
        jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads_tree))
    flat = jnp.pad(flat, (0, padded - flat.shape[0]))
    n = lax.axis_size(axis_name)
    return lax.psum_scatter(flat, axis_name, scatter_dimension=0,
                            tiled=True) / n


def gather_params(flat_slice, unravel, size: int, axis_name: str):
    """All-gather updated slices and rebuild the parameter pytree."""
    full = lax.all_gather(flat_slice, axis_name, axis=0, tiled=True)
    return unravel(full[:size])


# ----------------------------------------------------------------------
# Layer-wise optimizers (LARS/LAMB) under ZeRO-1
#
# The flat-shard update is exact for elementwise optimizers, but LARS
# and LAMB need per-LAYER norms — the norm of a flat shard mixes layers
# and pads. The fix is TPU-cheap: the flat layout's leaf boundaries are
# static, so each shard segment-sums its slice's squares into per-leaf
# buckets and ONE tiny psum (n_leaves floats) recovers the global
# per-layer norms. The elementwise remainder of the update then matches
# regimes.optim.{lars,lamb}_step exactly (tests/test_distributed.py).
# ----------------------------------------------------------------------


def leaf_segment_ids(params, n_shards: int):
    """Static int32 vector [padded]: flat index → leaf ordinal; the pad
    tail gets segment n_leaves (a discard bucket)."""
    import numpy as np
    leaves = jax.tree_util.tree_leaves(params)
    ids = np.concatenate([np.full(int(x.size), i, np.int32)
                          for i, x in enumerate(leaves)])
    padded = flat_size(params, n_shards)
    return np.pad(ids, (0, padded - ids.shape[0]),
                  constant_values=len(leaves))


def leaf_mask01(params, mask_tree):
    """Static per-leaf 0/1 weight-decay mask vector (numpy)."""
    import numpy as np
    flags = jax.tree_util.tree_map(lambda p, m: bool(m), params, mask_tree)
    return np.array([1.0 if f else 0.0
                     for f in jax.tree_util.tree_leaves(flags)], np.float32)


def segment_sq_sums(vec_slice, seg_slice, n_segments: int,
                    axis_name: Optional[str]):
    """Global per-leaf Σx² of a sharded flat vector (one small psum).
    With ``axis_name=None`` the vector is unsharded and the local
    segment sums are already global (the flat-optimizer path,
    regimes/optim.make_flat_update_fn)."""
    local = jax.ops.segment_sum(jnp.square(vec_slice), seg_slice,
                                num_segments=n_segments)
    return lax.psum(local, axis_name) if axis_name is not None else local


def lars_step_sharded(p_slice, g_slice, opt_state, hp, *, mask01,
                      seg_slice, w_sq, n_leaves: int, axis_name: Optional[str]):
    """LARS on a ZeRO-1 shard. ``w_sq`` is the per-leaf Σw² of the full
    (replicated) params; gradient norms come from segment-reduced
    shards. Elementwise math mirrors regimes.optim.lars_step."""
    g_sq = segment_sq_sums(g_slice, seg_slice, n_leaves + 1,
                           axis_name)[:n_leaves]
    w_norm = jnp.sqrt(w_sq)
    g_norm = jnp.sqrt(g_sq)
    eta, wd = hp["trust_coef"], hp["weight_decay"]
    lr, mom = hp["lr"], hp["momentum"]
    trust = jnp.where((w_norm > 0) & (g_norm > 0),
                      eta * w_norm / (g_norm + wd * w_norm + 1e-9), 1.0)
    # expand per-leaf trust to the shard's elements (pad bucket → 1.0)
    trust_slice = jnp.concatenate(
        [trust, jnp.ones((1,), trust.dtype)])[seg_slice]
    g2 = g_slice + (wd * mask01) * p_slice
    scale = jnp.where(mask01 > 0, trust_slice, 1.0) * lr
    mu = mom * opt_state["mu"] + scale * g2
    return p_slice - mu, {**opt_state, "mu": mu,
                          "step": opt_state["step"] + 1}


def lamb_step_sharded(p_slice, g_slice, opt_state, hp, *, mask01,
                      seg_slice, w_sq, leaf_mask, n_leaves: int,
                      axis_name: Optional[str]):
    """LAMB on a ZeRO-1 shard; mirrors regimes.optim.lamb_step with the
    trust ratio's ||w||/||update|| recovered by segment psums."""
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    b1, b2 = hp["beta1"], hp["beta2"]
    lr, wd, eps = hp["lr"], hp["weight_decay"], hp["eps"]
    m2 = b1 * opt_state["m"] + (1 - b1) * g_slice
    v2 = b2 * opt_state["v"] + (1 - b2) * jnp.square(g_slice)
    c1 = 1.0 - jnp.power(b1, t)
    c2 = 1.0 - jnp.power(b2, t)
    u = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps) + (wd * mask01) * p_slice
    u_sq = segment_sq_sums(u, seg_slice, n_leaves + 1,
                           axis_name)[:n_leaves]
    w_norm = jnp.sqrt(w_sq)
    u_norm = jnp.sqrt(u_sq)
    ratio = jnp.where((leaf_mask > 0) & (w_norm > 0) & (u_norm > 0),
                      w_norm / (u_norm + 1e-9), 1.0)
    ratio_slice = jnp.concatenate(
        [ratio, jnp.ones((1,), ratio.dtype)])[seg_slice]
    return p_slice - lr * ratio_slice * u, {
        **opt_state, "m": m2, "v": v2, "step": step}
