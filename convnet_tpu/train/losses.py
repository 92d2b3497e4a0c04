"""Cross-entropy accepting hard or soft targets, with label smoothing.

Rebuild of utils/cross_entropy.py:~15–130 (approx., SURVEY.md §2.2):
one API that handles (a) integer class targets, (b) label smoothing via
``smooth_eps`` (optionally against a non-uniform ``smooth_dist``), and
(c) soft-target distributions (the path mixup/cutmix need), plus
``ignore_index`` masking. All math in fp32 regardless of logits dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def onehot(target, num_classes, dtype=jnp.float32):
    """utils/misc.py onehot equivalent."""
    return jax.nn.one_hot(target, num_classes, dtype=dtype)


def _smooth(soft_target, smooth_eps, smooth_dist, num_classes):
    if smooth_eps and smooth_eps > 0:
        if smooth_dist is None:
            uniform = 1.0 / num_classes
            soft_target = soft_target * (1.0 - smooth_eps) + smooth_eps * uniform
        else:
            soft_target = (soft_target * (1.0 - smooth_eps)
                           + smooth_eps * jnp.asarray(smooth_dist, jnp.float32))
    return soft_target


def cross_entropy(
    logits,
    target,
    weight: Optional[jax.Array] = None,
    ignore_index: int = -100,
    reduction: str = "mean",
    smooth_eps: float = 0.0,
    smooth_dist=None,
):
    """CE over the last axis of ``logits``.

    ``target``: int array (hard labels) or float array of shape
    ``logits.shape`` (soft targets / mixup output).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)

    if jnp.issubdtype(jnp.asarray(target).dtype, jnp.integer):
        valid = target != ignore_index
        safe_target = jnp.where(valid, target, 0)
        soft = onehot(safe_target, num_classes)
    else:
        valid = jnp.ones(target.shape[:-1], bool)
        soft = target.astype(jnp.float32)

    soft = _smooth(soft, smooth_eps, smooth_dist, num_classes)
    loss = -jnp.sum(soft * logp, axis=-1)
    if weight is not None:
        # per-class weights gathered by the (hard or argmax) target class
        cls = (safe_target if jnp.issubdtype(jnp.asarray(target).dtype, jnp.integer)
               else jnp.argmax(soft, axis=-1))
        loss = loss * jnp.asarray(weight, jnp.float32)[cls]
    loss = jnp.where(valid, loss, 0.0)

    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(loss) / denom


def binary_cross_entropy(logits, target, reduction: str = "mean",
                         smooth_eps: float = 0.0, from_logits: bool = True):
    """Smoothed BCE (utils/cross_entropy.py's smoothed-BCE tail):
    targets are squeezed toward [eps/2, 1-eps/2] before the usual BCE.
    ``target`` may be hard {0,1} or soft probabilities, any shape equal
    to ``logits``."""
    target = jnp.asarray(target, jnp.float32)
    if smooth_eps and smooth_eps > 0:
        target = target * (1.0 - smooth_eps) + 0.5 * smooth_eps
    logits = logits.astype(jnp.float32)
    if from_logits:
        # numerically stable: max(x,0) - x*z + log(1+exp(-|x|))
        loss = (jnp.maximum(logits, 0) - logits * target
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    else:
        p = jnp.clip(logits, 1e-7, 1 - 1e-7)
        loss = -(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)


class BCELoss:
    def __init__(self, reduction="mean", smooth_eps=0.0, from_logits=True):
        self.reduction = reduction
        self.smooth_eps = smooth_eps
        self.from_logits = from_logits

    def __call__(self, logits, target):
        return binary_cross_entropy(logits, target, self.reduction,
                                    self.smooth_eps, self.from_logits)


class CrossEntropyLoss:
    """Callable config object (utils/cross_entropy.py CrossEntropyLoss)."""

    def __init__(self, weight=None, ignore_index=-100, reduction="mean",
                 smooth_eps=0.0, smooth_dist=None):
        self.weight = weight
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.smooth_eps = smooth_eps
        self.smooth_dist = smooth_dist

    def __call__(self, logits, target):
        return cross_entropy(logits, target, weight=self.weight,
                             ignore_index=self.ignore_index,
                             reduction=self.reduction,
                             smooth_eps=self.smooth_eps,
                             smooth_dist=self.smooth_dist)
