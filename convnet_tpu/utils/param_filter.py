"""Parameter filtering by path predicates.

Functional rebuild of utils/param_filter.py:~5–80 (approx.) —
``FilterParameters`` selecting (module, parameter) pairs by predicates
like "not a bias", "not a BatchNorm parameter". Here parameters are
nested-dict pytrees, so a *filter* is a predicate over the path tuple;
the result is a boolean **mask pytree** consumed by regularizers and
weight decay (regimes/regularization.py).

Naming conventions produced by nn/layers.py:
- conv / linear weights are leaves named ``'w'``;
- conv / linear biases are leaves named ``'b'``;
- BatchNorm affine parameters are ``'scale'`` / ``'bias'`` under a
  module path containing ``'bn'`` (all zoo models follow this).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax


def is_bias_param(path: Tuple[str, ...]) -> bool:
    """Conv/Linear biases are 'b'; BN shift is 'bias' (also a bias)."""
    return path[-1] in ("b", "bias")


def is_bn_param(path: Tuple[str, ...]) -> bool:
    """Only BatchNorm affine leaves use the names 'scale'/'bias'
    (nn/layers.py naming convention), so the leaf name is decisive."""
    return path[-1] in ("scale", "bias")


def _mask_tree(params, pred: Callable[[Tuple[str, ...]], bool]):
    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        return bool(pred(prefix))

    return walk(params, ())


def filter_params(params, include: Callable[[Tuple[str, ...]], bool]):
    """Boolean mask pytree: True where ``include(path)``."""
    return _mask_tree(params, include)


def wd_mask(params):
    """Default weight-decay mask: weights only — no biases, no BN affine.

    Mirrors models/resnet.py ``weight_decay_config()`` (~30–45 approx.)
    which filters out biases and BatchNorm parameters.
    """
    return filter_params(params, lambda p: not (is_bias_param(p) or is_bn_param(p)))


def apply_mask(tree, mask, where_true, where_false):
    """Elementwise select between two pytrees by a boolean mask pytree."""
    return jax.tree_util.tree_map(
        lambda m, t, f: t if m else f, mask, where_true, where_false)
