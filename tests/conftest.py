"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "distributed without a cluster" strategy from SURVEY.md §4:
``--xla_force_host_platform_device_count=8`` yields 8 fake CPU devices,
letting the same mesh/`jit`/`shard_map` code that targets a TPU slice be
exercised hermetically (sharded training, cross-replica BN, per-host
input sharding). Must run before any JAX backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin (sitecustomize) registers platforms "axon,cpu";
# pin tests to CPU so they are fast and hermetic.
jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
