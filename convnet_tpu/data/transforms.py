"""Device-side batched augmentation primitives (jit/vmap-friendly).

TPU-native counterpart of preprocess.py:~30–230 (approx., SURVEY.md
§2.2): where the reference composes per-sample torchvision/PIL
transforms inside DataLoader worker processes, these run **batched on
the accelerator** with per-sample PRNG keys — pad+random-crop, flip,
cutout, normalize, PCA lighting — leaving only JPEG decode (and
optional PIL-based random-resized-crop / AutoAugment) on the host.

All functions take ``x`` as NHWC float32 in [0, 1] unless noted, and a
single PRNG key (internally split per sample).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from jax import lax


def to_float(x):
    """uint8 [0,255] → float32 [0,1] (no-op for float input)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x
    return x.astype(jnp.float32) / 255.0


def normalize(x, mean: Sequence[float], std: Sequence[float]):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def random_hflip(key, x, p=0.5):
    mask = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, jnp.flip(x, axis=2), x)


def pad_random_crop(key, x, padding: int):
    """CIFAR-style: zero-pad by ``padding`` then random-crop back to the
    original size, per sample (preprocess.py pad_random_crop)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oy = jax.random.randint(jax.random.fold_in(key, 0), (b,), 0, 2 * padding + 1)
    ox = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, 2 * padding + 1)

    def crop(img, y0, x0):
        return lax.dynamic_slice(img, (y0, x0, 0), (h, w, c))

    return jax.vmap(crop)(xp, oy, ox)


def random_crop(key, x, size: int):
    """Random crop to size×size (input must be ≥ size)."""
    b, h, w, c = x.shape
    oy = jax.random.randint(jax.random.fold_in(key, 0), (b,), 0, h - size + 1)
    ox = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, w - size + 1)

    def crop(img, y0, x0):
        return lax.dynamic_slice(img, (y0, x0, 0), (size, size, c))

    return jax.vmap(crop)(x, oy, ox)


def center_crop(x, size: int):
    b, h, w, c = x.shape
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return x[:, y0:y0 + size, x0:x0 + size, :]


def cutout(key, x, size: int, count: int = 1):
    """Per-sample square cutout holes (preprocess.py Cutout:~150–180)."""
    b, h, w, _ = x.shape
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]

    def one_mask(k):
        mask = jnp.ones((h, w), jnp.float32)
        for i in range(count):
            ki = jax.random.fold_in(k, i)
            cy = jax.random.randint(jax.random.fold_in(ki, 0), (), 0, h)
            cx = jax.random.randint(jax.random.fold_in(ki, 1), (), 0, w)
            hole = ((rows >= cy - size // 2) & (rows < cy + size - size // 2)
                    & (cols >= cx - size // 2) & (cols < cx + size - size // 2))
            mask = mask * (1.0 - hole.astype(jnp.float32))
        return mask

    keys = jax.random.split(key, b)
    masks = jax.vmap(one_mask)(keys)
    return x * masks[..., None]


def lighting(key, x, alphastd: float, eigval: Sequence[float],
             eigvec: Sequence[Sequence[float]]):
    """AlexNet-style PCA color noise (preprocess.py Lighting:~120–150)."""
    if alphastd == 0:
        return x
    b = x.shape[0]
    alpha = alphastd * jax.random.normal(key, (b, 3), jnp.float32)
    ev = jnp.asarray(eigval, jnp.float32)           # (3,)
    evec = jnp.asarray(eigvec, jnp.float32)         # (3, 3) rows=rgb
    delta = (evec * (alpha * ev)[:, None, :]).sum(-1)   # (b, 3)
    return x + delta[:, None, None, :]


def random_resized_crop(key, x, out_size: int,
                        scale: Tuple[float, float] = (0.08, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                        method: str = "bilinear"):
    """Inception-style random-resized-crop, fully on device: sample a
    (scale, aspect) box per sample, then resample to ``out_size`` with
    a vmapped ``scale_and_translate`` (static output shape — TPU-safe).

    The host pipeline may instead do this with PIL at decode time; this
    version exists so raw fixed-size batches can be augmented entirely
    on the accelerator.
    """
    b, h, w, c = x.shape
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k_ratio, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    # target box (may exceed bounds → clip)
    bh = jnp.sqrt(area * h * w / r)
    bw = bh * r
    bh = jnp.clip(bh, 8.0, float(h))
    bw = jnp.clip(bw, 8.0, float(w))
    oy = jax.random.uniform(k_y, (b,)) * (h - bh)
    ox = jax.random.uniform(k_x, (b,)) * (w - bw)

    def resample(img, bh_, bw_, oy_, ox_):
        sy = out_size / bh_
        sx = out_size / bw_
        return jax.image.scale_and_translate(
            img, (out_size, out_size, c), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-oy_ * sy, -ox_ * sx]),
            method=method, antialias=True)

    return jax.vmap(resample)(x.astype(jnp.float32), bh, bw, oy, ox)


def resize(x, size: int, method: str = "bilinear"):
    b, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (b, size, size, c),
                            method=method)
