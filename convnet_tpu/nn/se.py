"""Squeeze-and-Excitation blocks.

TPU-native rebuild of the reference's models/modules/se.py:~5–60
(approx., unverified — SURVEY.md §2.2): global-pool → FC bottleneck →
gate. The gate multiply is a natural Pallas fusion target
(ops/pallas/residual.py fuses gate*x (+residual) + ReLU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu.core.module import Module, Context
from convnet_tpu.nn.layers import Linear


def _squeeze(x, ctx):
    """Global average over (H, W) — pmean over the spatial axis when
    height is sharded. Spatial TRAINING is unsupported for SE: the
    squeeze's FC params sit between sharded cotangents (gate path) and
    replicated activations, so neither psum nor pmean of their grads is
    correct without a per-param convention (parallel/spatial.py
    ``spatial_grad_reduce`` docs); inference is fine."""
    if getattr(ctx, "spatial_axis", None) is not None and ctx.train:
        raise NotImplementedError(
            "SE blocks do not support spatial-partitioned training")
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if getattr(ctx, "spatial_axis", None) is not None:
        s = jax.lax.pmean(s, ctx.spatial_axis)
    return s.astype(x.dtype)


class SEBlock(Module):
    def __init__(self, channels, reduction=16):
        self.channels = channels
        hidden = max(channels // reduction, 1)
        self.fc1 = Linear(channels, hidden)
        self.fc2 = Linear(hidden, channels)

    def __call__(self, params, state, x, ctx: Context):
        s = _squeeze(x, ctx)
        s, _ = self.fc1(params["fc1"], {}, s, ctx)
        s = jax.nn.relu(s)
        s, _ = self.fc2(params["fc2"], {}, s, ctx)
        gate = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :], state


class SESwishBlock(Module):
    """Swish-gated SE variant (se.py:~40–60 approx.)."""

    def __init__(self, channels, reduction=16):
        self.channels = channels
        hidden = max(channels // reduction, 1)
        self.fc1 = Linear(channels, hidden)
        self.fc2 = Linear(hidden, channels)

    def __call__(self, params, state, x, ctx: Context):
        s = _squeeze(x, ctx)
        s, _ = self.fc1(params["fc1"], {}, s, ctx)
        s = jax.nn.swish(s)
        s, _ = self.fc2(params["fc2"], {}, s, ctx)
        gate = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, None, :], state
