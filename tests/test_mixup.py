"""MixUp/CutMix target math (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu.train.mixup import mixup_batch, cutmix_batch, rand_bbox_mask


def test_mixup_math():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(4 * 2 * 2 * 1, dtype=jnp.float32).reshape(4, 2, 2, 1)
    y = jnp.array([0, 1, 2, 3])
    mixed, soft = mixup_batch(key, x, y, num_classes=4, alpha=1.0)
    # recover lambda from the soft targets of sample 0 (paired with 3)
    lam = float(soft[0, 0])
    assert 0.0 <= lam <= 1.0
    expect = lam * x + (1 - lam) * jnp.flip(x, 0)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(expect),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    assert float(soft[0, 3]) == pytest.approx(1 - lam, rel=1e-4)


def test_cutmix_area_lambda():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((2, 16, 16, 3))
    y = jnp.array([0, 1])
    mixed, soft = cutmix_batch(key, x, y, num_classes=2, alpha=1.0)
    # soft targets λ equals the actual pasted-area fraction
    lam = float(soft[0, 0])
    assert 0.0 <= lam <= 1.0
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)


def test_rand_bbox_mask_area():
    key = jax.random.PRNGKey(2)
    mask, (y1, y2, x1, x2) = rand_bbox_mask(key, 32, 32, jnp.float32(0.75))
    area = float(mask.sum())
    assert area == float((y2 - y1) * (x2 - x1))


def test_mixup_deterministic():
    key = jax.random.PRNGKey(3)
    x = jnp.ones((4, 4, 4, 3))
    y = jnp.array([0, 1, 2, 3])
    a1 = mixup_batch(key, x, y, 4)
    a2 = mixup_batch(key, x, y, 4)
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
