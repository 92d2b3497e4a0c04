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
