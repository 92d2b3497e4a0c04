"""Device mesh + data-parallel sharding utilities.

TPU-native replacement for the reference's distributed-communication
layer (SURVEY.md §2.4): where the reference wires
``dist.init_process_group`` (main.py:~170–185 approx.) +
DistributedDataParallel + DistributedSampler + NCCL all-reduce, this
framework uses a ``jax.sharding.Mesh`` with a ``'data'`` axis.
Gradient all-reduce is an explicit ``lax.pmean`` inside the
``shard_map``-wrapped train step, riding ICI within a slice and DCN
across slices; cross-replica BatchNorm uses ``lax.pmean`` of batch
moments over the same axis (ops/norm.py).

Multi-host: call ``jax.distributed.initialize`` (coordinator address ≈
``MASTER_ADDR``) before ``make_mesh``; every host then sees the global
device set and feeds its local shard of the batch (data/loader.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the first N) devices.

    When using the full device set, the mesh is built with
    ``mesh_utils.create_device_mesh`` so device order follows the
    physical ICI topology (ring/torus-contiguous neighbors) — gradient
    all-reduce then rides nearest-neighbor links instead of arbitrary
    hops (SURVEY.md §2.4 "collectives ride ICI").
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(devices) == len(jax.devices()) and len(devices) > 1:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh((len(devices),),
                                                devices=devices)
            return Mesh(arr, (axis_name,))
        except Exception:  # topology info unavailable → plain order
            pass
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(spatial: int, num_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data × spatial) mesh: batch shards over 'data', activation
    height over 'spatial' (parallel/spatial.py)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % spatial:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    if n == len(jax.devices()):
        try:
            # topology-aware: spatial (halo-exchange) neighbors land on
            # adjacent chips; data-parallel all-reduce rings the rest
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh((n // spatial, spatial),
                                                devices=devices)
            return Mesh(arr, ("data", "spatial"))
        except Exception:
            pass
    return Mesh(np.asarray(devices).reshape(n // spatial, spatial),
                ("data", "spatial"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard the leading (batch) axis of each leaf across the data axis.

    Single-host: a plain device_put with a NamedSharding. Multi-host:
    each process holds only its LOCAL slice of the global batch (the
    loader already applied per-host sharding), so the global array is
    assembled from process-local data — the jax.Array analog of the
    reference's DistributedSampler + per-rank batches.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def local_batch_size(global_batch: int, mesh: Mesh,
                     axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"degree {n}")
    return global_batch // n


def process_batch_slice(global_batch: int) -> slice:
    """The slice of the global batch this host is responsible for
    (per-host input sharding for multi-host runs)."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    return slice(idx * per, (idx + 1) * per)
