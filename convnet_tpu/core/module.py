"""Minimal functional module system for TPU-native model building.

Philosophy (SURVEY.md §7 step 1): modules are *plain Python objects*
describing architecture; parameters and mutable state (BN running
statistics) live in separate **pytrees** so the whole model is compatible
with `jax.jit`, `jax.grad`, donation, sharding and `jax.checkpoint`
without any library magic. There is no tracing-based parameter creation:

- ``module.init(key) -> (params, state)`` builds nested dicts keyed by
  child-module attribute names (insertion order = definition order in
  ``__init__``, which makes key-splitting deterministic).
- ``module(params, state, x, ctx) -> (y, new_state)`` is the forward
  pass; ``ctx`` carries train/eval mode, PRNG, dtype policy, the kernel
  implementation switch (xla/pallas) and the mesh axis name for
  cross-replica BatchNorm.

Composite modules (blocks, models) get a default ``init`` that walks
their child modules; leaf layers (Conv2d, BatchNorm, ...) override
``init`` to create their own arrays.

This replaces the reference's use of ``torch.nn.Module``
(models/*.py throughout, SURVEY.md §1 L2) with an explicitly functional
equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from convnet_tpu.core.dtypes import Policy, DEFAULT_POLICY


@dataclasses.dataclass
class Context:
    """Per-call context threaded through the forward pass.

    Attributes:
      train: training mode (BN batch stats, dropout active).
      rng: optional PRNG key for stochastic layers (dropout).
      policy: dtype policy (param/compute/stat dtypes).
      axis_name: mesh axis name for cross-replica BN (``None`` =
        per-replica statistics, the reference's default behavior).
      spatial_axis: mesh axis name over which activation HEIGHT is
        sharded (spatial partitioning, parallel/spatial.py); convs and
        pools halo-exchange over it, BN moments and global pooling
        reduce over it. ``None`` = no spatial sharding.
      impl: kernel implementation: ``"xla"`` or ``"pallas"``.
      aux: optional collector for auxiliary-classifier logits
        (GoogLeNet/Inception-v3 training heads — reference
        models/googlenet.py aux branches). The caller (the Trainer's
        loss fn) passes an empty list; models with aux heads enabled
        append ``(weight, logits)`` during the training forward, and
        the loss adds ``weight * CE(logits, y)`` per entry. ``None``
        (the default, and always at eval) disables collection.
      quant: optional :class:`convnet_tpu.nn.quant.QuantCtx` — int8
        post-training quantization of eligible pointwise convs
        (serving path only; ``None`` everywhere else). A fresh object
        is required per trace.
    """

    train: bool = False
    rng: Optional[jax.Array] = None
    policy: Policy = DEFAULT_POLICY
    axis_name: Optional[str] = None
    spatial_axis: Optional[str] = None
    impl: str = "xla"
    aux: Optional[list] = None
    quant: Optional[object] = None

    def next_rng(self) -> jax.Array:
        """Split off a fresh key (deterministic across retraces/remat)."""
        if self.rng is None:
            raise ValueError("Context.rng is required for stochastic layers")
        self.rng, key = jax.random.split(self.rng)
        return key

    def eval_mode(self) -> "Context":
        return dataclasses.replace(self, train=False)


class Module:
    """Base class. Subclasses define children in ``__init__`` and a
    ``__call__(params, state, x, ctx)`` forward."""

    def children(self):
        """Yield (name, module) for every direct child, in definition order.

        Lists/tuples of modules appear as ``name.<i>`` entries; dicts as
        ``name.<key>``.
        """
        for name, value in vars(self).items():
            if isinstance(value, Module):
                yield name, value
            elif isinstance(value, (list, tuple)):
                for i, item in enumerate(value):
                    if isinstance(item, Module):
                        yield f"{name}.{i}", item
            elif isinstance(value, dict):
                for k, item in value.items():
                    if isinstance(item, Module):
                        yield f"{name}.{k}", item

    def init(self, key, policy: Policy = DEFAULT_POLICY):
        """Default init: recursively init children into nested dicts."""
        params, state = {}, {}
        kids = list(self.children())
        if kids:
            keys = jax.random.split(key, len(kids))
            for (name, child), k in zip(kids, keys):
                p, s = child.init(k, policy)
                if p:
                    params[name] = p
                if s:
                    state[name] = s
        return params, state

    def __call__(self, params, state, x, ctx: Context):
        raise NotImplementedError

    # -- convenience -------------------------------------------------------

    def sub(self, params, state, name):
        """Fetch a child's (params, state), tolerating param-less children."""
        return params.get(name, {}), state.get(name, {})

    def __repr__(self):
        kids = ", ".join(name for name, _ in self.children())
        return f"{type(self).__name__}({kids})"


class Sequential(Module):
    """Ordered container; mirrors torch.nn.Sequential usage in the
    reference's models (e.g. models/alexnet.py:~10–70 approx.)."""

    def __init__(self, *layers, names=None):
        if names is None:
            names = [str(i) for i in range(len(layers))]
        self.layers = dict(zip(names, layers))

    def children(self):
        for name, layer in self.layers.items():
            yield name, layer

    def __call__(self, params, state, x, ctx):
        new_state = dict(state)
        for name, layer in self.layers.items():
            p, s = self.sub(params, state, name)
            x, s2 = layer(p, s, x, ctx)
            if s2:
                new_state[name] = s2
        return x, new_state

    def __getitem__(self, name):
        return self.layers[str(name)]

    def __len__(self):
        return len(self.layers)


class Identity(Module):
    def init(self, key, policy=DEFAULT_POLICY):
        return {}, {}

    def __call__(self, params, state, x, ctx):
        return x, state


def init_module(module: Module, key, policy: Policy = DEFAULT_POLICY):
    """Top-level init helper: returns (params, state)."""
    return module.init(key, policy)


def apply_module(module: Module, params, state, x, *, train=False, rng=None,
                 policy: Policy = DEFAULT_POLICY, axis_name=None, impl="xla"):
    """Top-level apply helper building a Context."""
    ctx = Context(train=train, rng=rng, policy=policy, axis_name=axis_name,
                  impl=impl)
    return module(params, state, x, ctx)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def param_bytes(params) -> int:
    return sum(int(x.size * x.dtype.itemsize)
               for x in jax.tree_util.tree_leaves(params))


def tree_paths(tree, prefix=()):
    """Yield (path_tuple, leaf) for a nested-dict pytree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree
