"""Gradient verification via finite differences on a tiny net
(SURVEY.md §4 'gradient check via finite differences on tiny nets')
and end-to-end determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.models.resnet import ConvBN
from convnet_tpu.train.losses import cross_entropy


def test_finite_difference_gradients():
    """jax.grad of a conv+BN+pool+linear loss matches central
    differences to 1e-3 on a handful of parameters."""
    blk = ConvBN(2, 4, 3, 1, 1)
    params, state = blk.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 2))
    y = jnp.array([1, 3])

    def loss_of(params):
        ctx = Context(train=True, rng=jax.random.PRNGKey(2))
        h, _ = blk(params, state, x, ctx)
        logits = jnp.mean(h, axis=(1, 2))
        return cross_entropy(logits, y)

    g = jax.grad(loss_of)(params)
    eps = 1e-3
    rng = np.random.default_rng(0)
    flat, treedef = jax.tree_util.tree_flatten(params)
    gflat = jax.tree_util.tree_leaves(g)
    for leaf_i, (leaf, gleaf) in enumerate(zip(flat, gflat)):
        # probe 3 random coordinates per leaf
        for _ in range(3):
            idx = tuple(rng.integers(0, s) for s in leaf.shape)
            delta = jnp.zeros_like(leaf).at[idx].set(eps)
            plus = jax.tree_util.tree_unflatten(
                treedef, [l + delta if j == leaf_i else l
                          for j, l in enumerate(flat)])
            minus = jax.tree_util.tree_unflatten(
                treedef, [l - delta if j == leaf_i else l
                          for j, l in enumerate(flat)])
            fd = (float(loss_of(plus)) - float(loss_of(minus))) / (2 * eps)
            an = float(gleaf[idx])
            assert abs(fd - an) < 1e-2 * max(abs(fd), abs(an), 1.0), (
                leaf_i, idx, fd, an)


@pytest.mark.slow
def test_training_determinism():
    """Identical seeds → bit-identical parameters after training."""
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    from convnet_tpu.data.data_regime import DataRegime

    def run():
        m = models.build("resnet", dataset="cifar10", depth=20)
        tr = Trainer(m, OptimRegime(m.regime), 10,
                     TrainerConfig(print_freq=0, mixup_alpha=0.2), seed=11)
        p, s = m.init(jax.random.PRNGKey(11))
        p, s, o = tr.initialize(p, s)
        data = DataRegime(defaults={"name": "synthetic", "batch_size": 16,
                                    "dataset_kwargs": {"size": 64}},
                          seed=11)
        data.set_epoch(0)
        p, s, o, _ = tr.train_epoch(data.get_loader(), p, s, o, 0)
        return jax.device_get(p)

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_process_sharding():
    """Per-host shards of the epoch permutation partition the dataset
    (DistributedSampler semantics)."""
    from convnet_tpu.data.datasets import SyntheticDataset
    from convnet_tpu.data.loader import ArrayBatcher
    from convnet_tpu.data.preprocess import get_transform
    ds = SyntheticDataset(size=64)
    tf = get_transform("cifar10", augment=False)
    seen = []
    for rank in range(2):
        loader = ArrayBatcher(ds, tf, batch_size=8, shuffle=True,
                              process_index=rank, process_count=2, seed=3)
        labels = []
        for x, y in loader:
            labels.append(np.asarray(y))
        assert sum(l.shape[0] for l in labels) == 32  # half the data each
        seen.append(np.concatenate(labels))
    # determinism: both ranks drew from the same permutation
    loader_again = ArrayBatcher(ds, tf, batch_size=8, shuffle=True,
                                process_index=0, process_count=2, seed=3)
    again = np.concatenate([np.asarray(y) for _, y in loader_again])
    np.testing.assert_array_equal(seen[0], again)
