"""Weight initializers (pure functions of (key, shape, dtype)).

Conventions match what the reference's model zoo relies on from torch
defaults plus its explicit ``init_model`` (models/resnet.py:~180–260,
approx.): Kaiming/He-normal fan-out for convs, uniform fan-in for linear
layers, BN gamma=1 / beta=0 (gamma=0 on the last BN of a residual branch
for the zero-init variant).

All weights here are laid out TPU-style: conv kernels HWIO
(height, width, in_ch/groups, out_ch), linear kernels (in, out).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _conv_fans(shape):
    # HWIO
    rf = math.prod(shape[:-2])
    fan_in = shape[-2] * rf
    fan_out = shape[-1] * rf
    return fan_in, fan_out


def kaiming_normal(key, shape, dtype=jnp.float32, mode="fan_out", gain=math.sqrt(2.0)):
    """He-normal init for conv (HWIO) or linear ((in, out)) weights."""
    if len(shape) >= 2:
        fan_in, fan_out = _conv_fans(shape) if len(shape) > 2 else (shape[0], shape[1])
    else:
        fan_in = fan_out = shape[0]
    fan = fan_out if mode == "fan_out" else fan_in
    std = gain / math.sqrt(max(fan, 1))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32, mode="fan_in", gain=math.sqrt(2.0)):
    if len(shape) >= 2:
        fan_in, fan_out = _conv_fans(shape) if len(shape) > 2 else (shape[0], shape[1])
    else:
        fan_in = fan_out = shape[0]
    fan = fan_out if mode == "fan_out" else fan_in
    bound = gain * math.sqrt(3.0 / max(fan, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_default(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape=(in, out)."""
    bound = 1.0 / math.sqrt(max(shape[0], 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_bound(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(stddev=0.01):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)
