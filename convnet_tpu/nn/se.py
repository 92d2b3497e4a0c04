"""Squeeze-and-Excitation blocks.

TPU-native rebuild of the reference's models/modules/se.py:~5–60
(approx., unverified — SURVEY.md §2.2): global-pool → FC bottleneck →
gate. The gate multiply is a pointwise epilogue XLA fuses into the
surrounding block (the guaranteed-fusion Pallas floor for such
epilogues is ops/pallas/matmul_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu import ops
from convnet_tpu.core.module import Module, Context
from convnet_tpu.nn.layers import Linear


def _squeeze(x, ctx):
    """Global average over (H, W) — pmean over the spatial axis when
    height is sharded.

    Spatial gradient plumbing (parallel/spatial.py invariant): the SE
    FC params live in the trunk subtree whose grads are psum'd at the
    end, so their cotangents must be exact/n per shard. The gate's
    replicated-use boundary pmeans the partial cotangents (exact/n ✓),
    and the grad-scale op below restores exact cotangents before the
    paired squeeze pmean (whose backward divides by n), keeping the
    upstream conv path exact-partial.
    """
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if getattr(ctx, "spatial_axis", None) is not None:
        from convnet_tpu.parallel.spatial import (
            pmean_paired, grad_scale_by_axis)
        s = pmean_paired(s, ctx.spatial_axis)
        s = grad_scale_by_axis(s, ctx.spatial_axis)
    return s.astype(x.dtype)


def _gate(gate, ctx):
    if getattr(ctx, "spatial_axis", None) is not None:
        from convnet_tpu.parallel.spatial import replicated_use_mean
        gate = replicated_use_mean(gate, ctx.spatial_axis)
    return gate


class SEBlock(Module):
    def __init__(self, channels, reduction=16):
        self.channels = channels
        hidden = max(channels // reduction, 1)
        self.fc1 = Linear(channels, hidden)
        self.fc2 = Linear(hidden, channels)

    def __call__(self, params, state, x, ctx: Context):
        s = _squeeze(x, ctx)
        s, _ = self.fc1(params["fc1"], {}, s, ctx)
        s = ops.relu(s)
        s, _ = self.fc2(params["fc2"], {}, s, ctx)
        gate = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        gate = _gate(gate, ctx)
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
        gate = _gate(gate, ctx)
        return x * gate[:, None, None, :], state
