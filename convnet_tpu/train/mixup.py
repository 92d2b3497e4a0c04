"""MixUp / CutMix as pure jittable functions.

Rebuild of utils/mixup.py:~10–110 (approx., SURVEY.md §2.2): sample
λ ~ Beta(α, α), mix the batch with a reversed copy of itself, and expose
soft targets for the soft-target CE path. CutMix pastes a rectangular
patch instead (``rand_bbox``). Runs **on device inside the train step**
(the reference does this on-GPU inside Trainer._step too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu.train.losses import onehot


def _sample_lam(key, alpha):
    # Beta(a, a) via two gammas; fp32
    g1, g2 = jax.random.gamma(key, jnp.array([alpha, alpha], jnp.float32))
    return g1 / (g1 + g2)


def mixup_batch(key, x, target, num_classes, alpha=1.0, smooth_eps=0.0):
    """Returns (mixed_x, soft_target). Pairs each sample with the
    reversed batch (the reference mixes against ``flip(0)``)."""
    lam = _sample_lam(key, alpha)
    lam_x = lam.astype(x.dtype)
    mixed = lam_x * x + (1.0 - lam_x) * jnp.flip(x, axis=0)
    soft = onehot(target, num_classes)
    soft = lam * soft + (1.0 - lam) * jnp.flip(soft, axis=0)
    return mixed, soft


def rand_bbox_mask(key, height, width, lam):
    """Boolean mask (H, W) of a random box with area ≈ (1-λ)·H·W
    (utils/mixup.py rand_bbox:~60–80 equivalent, as a mask so it is
    jit-friendly with static shapes)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (height * cut_rat).astype(jnp.int32)
    cut_w = (width * cut_rat).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, height)
    cx = jax.random.randint(kx, (), 0, width)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    rows = jnp.arange(height)[:, None]
    cols = jnp.arange(width)[None, :]
    return (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2), (y1, y2, x1, x2)


def cutmix_batch(key, x, target, num_classes, alpha=1.0):
    """NHWC CutMix; λ is corrected to the exact pasted-area ratio."""
    klam, kbox = jax.random.split(key)
    lam = _sample_lam(klam, alpha)
    h, w = x.shape[1], x.shape[2]
    mask, (y1, y2, x1, x2) = rand_bbox_mask(kbox, h, w, lam)
    mixed = jnp.where(mask[None, :, :, None], jnp.flip(x, axis=0), x)
    # adjust lambda to match exact area ratio (reference does the same)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    soft = onehot(target, num_classes)
    soft = lam_adj * soft + (1.0 - lam_adj) * jnp.flip(soft, axis=0)
    return mixed, soft


class MixUp:
    """Config wrapper mirroring the reference's MixUp module API."""

    def __init__(self, alpha=1.0, num_classes=None):
        self.alpha = alpha
        self.num_classes = num_classes

    def __call__(self, key, x, target, num_classes=None):
        return mixup_batch(key, x, target, num_classes or self.num_classes,
                           self.alpha)


class CutMix(MixUp):
    def __call__(self, key, x, target, num_classes=None):
        return cutmix_batch(key, x, target, num_classes or self.num_classes,
                            self.alpha)
