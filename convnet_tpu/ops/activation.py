"""Activations with residual-lean backward rules.

``relu`` here replaces ``jax.nn.relu`` (used for every reference
``nn.ReLU``/``F.relu`` site, models/*.py throughout): identical
forward, but the VJP saves the OUTPUT instead of the input and masks
with ``y > 0``. Since ``y = max(x, 0)``, ``y > 0 ⟺ x > 0``, so the
gradient is bitwise identical to ``jax.nn.relu``'s rule (0 at x == 0).

Measured on v5e (scripts/jobs/done/014_relu_vjp_ab.out): model-level
NEUTRAL — RN50 105.2 vs 105.6 ms, GoogLeNet 74.6 vs 74.5 — because
XLA already rematerializes pre-activation elementwise producers inside
backward fusions instead of storing them (see the `.clone` recompute
subgraphs in scripts/jobs/done/013_dump_top_fusions.out), so the
input-saving rule never actually materialized the pre-activations.
Kept as the default anyway: the output-saving rule guarantees that
property at the VJP level rather than relying on the backend's
remat heuristics, pins the x == 0 gradient to torch semantics
explicitly, and shrinks the saved-residual pytree (the output is
shared with the next op's residual instead of duplicating a tensor).

``relu6`` gets the same treatment; its upper clamp makes the output
mask ``0 < y < 6`` (grad 0 at both clamp boundaries, matching
``jax.nn.relu6``).

CONVNET_TPU_RELU_VJP=0 restores ``jax.nn.relu`` for A/B.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _relu_out(x):
    return jnp.maximum(x, jnp.zeros((), x.dtype))


def _relu_out_fwd(x):
    y = jnp.maximum(x, jnp.zeros((), x.dtype))
    return y, y


def _relu_out_bwd(y, dy):
    zero = jnp.zeros((), dy.dtype)
    return (jnp.where(y > 0, dy, zero),)


_relu_out.defvjp(_relu_out_fwd, _relu_out_bwd)


@jax.custom_vjp
def _relu6_out(x):
    return jnp.minimum(jnp.maximum(x, jnp.zeros((), x.dtype)),
                       jnp.asarray(6.0, x.dtype))


def _relu6_out_fwd(x):
    y = _relu6_out(x)
    return y, y


def _relu6_out_bwd(y, dy):
    zero = jnp.zeros((), dy.dtype)
    keep = jnp.logical_and(y > 0, y < 6)
    return (jnp.where(keep, dy, zero),)


_relu6_out.defvjp(_relu6_out_fwd, _relu6_out_bwd)


def relu(x):
    if os.environ.get("CONVNET_TPU_RELU_VJP", "1") == "0":
        return jax.nn.relu(x)
    return _relu_out(x)


def relu6(x):
    if os.environ.get("CONVNET_TPU_RELU_VJP", "1") == "0":
        return jnp.minimum(jax.nn.relu(x), jnp.asarray(6.0, x.dtype))
    return _relu6_out(x)
