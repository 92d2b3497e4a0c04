"""BN folding ≡ unfused forward (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.utils.absorb_bn import search_absorb_bn


def _randomize_bn_stats(state, key):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    keys = jax.random.split(key, len(leaves))
    new = []
    for leaf, k in zip(leaves, keys):
        r = jax.random.normal(k, leaf.shape) * 0.3
        new.append(leaf + r if leaf.ndim else leaf)
    return jax.tree_util.tree_unflatten(treedef, new)


def test_absorb_bn_resnet_cifar():
    model = models.build("resnet", dataset="cifar10", depth=20)
    params, state = model.init(jax.random.PRNGKey(0))
    # make running stats non-trivial so the fold is meaningful
    state = _randomize_bn_stats(state, jax.random.PRNGKey(1))
    state = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) + 0.1 if x.ndim == 1 else x, state)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    ctx = Context(train=False)
    y_ref, _ = model(params, state, x, ctx)

    fp, fs = search_absorb_bn(params, state)
    y_fold, _ = model(fp, fs, x, ctx)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-4)
    # folding actually identity-ized the BN multipliers
    assert float(jnp.max(jnp.abs(fs["stem"]["bn"]["mean"]))) < 1e-6


def test_absorb_bn_mobilenet():
    model = models.build("mobilenet", width=0.25)
    params, state = model.init(jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda x: jnp.abs(x) * 0.5 + 0.2, state)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ctx = Context(train=False)
    y_ref, _ = model(params, state, x, ctx)
    fp, fs = search_absorb_bn(params, state)
    y_fold, _ = model(fp, fs, x, ctx)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_absorb_bn_googlenet_and_inception():
    """Fold correctness on multi-branch architectures."""
    for name, cfg, size in [("googlenet", {}, 64),
                            ("inception_v3", {}, 96)]:
        model = models.build(name, **cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        state = jax.tree_util.tree_map(
            lambda x: jnp.abs(x) * 0.5 + 0.2, state)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, 3))
        ctx = Context(train=False)
        y_ref, _ = model(params, state, x, ctx)
        fp, fs = search_absorb_bn(params, state)
        y_fold, _ = model(fp, fs, x, ctx)
        np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                                   rtol=2e-3, atol=2e-3)
