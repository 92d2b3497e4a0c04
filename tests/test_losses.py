"""Cross-entropy parity vs torch.nn.functional (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from convnet_tpu.train.losses import cross_entropy, CrossEntropyLoss


@pytest.fixture
def logits_targets():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (16,))
    return logits, targets


def test_hard_targets_match_torch(logits_targets):
    logits, targets = logits_targets
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    theirs = F.cross_entropy(torch.tensor(logits), torch.tensor(targets))
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_label_smoothing_matches_torch(logits_targets):
    logits, targets = logits_targets
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                         smooth_eps=0.1)
    theirs = F.cross_entropy(torch.tensor(logits), torch.tensor(targets),
                             label_smoothing=0.1)
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_soft_targets(logits_targets):
    logits, targets = logits_targets
    soft = np.eye(10, dtype=np.float32)[targets]
    ours_soft = cross_entropy(jnp.asarray(logits), jnp.asarray(soft))
    ours_hard = cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    assert float(ours_soft) == pytest.approx(float(ours_hard), rel=1e-6)


def test_ignore_index(logits_targets):
    logits, targets = logits_targets
    t = np.array(targets)
    t[:4] = -100
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(t))
    theirs = F.cross_entropy(torch.tensor(logits), torch.tensor(t),
                             ignore_index=-100)
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_reductions(logits_targets):
    logits, targets = logits_targets
    none = cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                         reduction="none")
    assert none.shape == (16,)
    s = cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                      reduction="sum")
    assert float(s) == pytest.approx(float(jnp.sum(none)), rel=1e-6)


def test_class_weights(logits_targets):
    logits, targets = logits_targets
    w = np.linspace(0.5, 2.0, 10).astype(np.float32)
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                         weight=jnp.asarray(w), reduction="sum")
    theirs = F.cross_entropy(torch.tensor(logits), torch.tensor(targets),
                             weight=torch.tensor(w), reduction="sum")
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_criterion_object(logits_targets):
    logits, targets = logits_targets
    crit = CrossEntropyLoss(smooth_eps=0.1)
    val = crit(jnp.asarray(logits), jnp.asarray(targets))
    assert np.isfinite(float(val))


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    target = rng.integers(0, 2, (8, 5)).astype(np.float32)
    from convnet_tpu.train.losses import binary_cross_entropy
    ours = binary_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(target))
    assert float(ours) == pytest.approx(float(theirs), rel=1e-5)


def test_bce_smoothing():
    from convnet_tpu.train.losses import binary_cross_entropy
    logits = jnp.asarray([[4.0, -4.0]])
    target = jnp.asarray([[1.0, 0.0]])
    plain = binary_cross_entropy(logits, target)
    smoothed = binary_cross_entropy(logits, target, smooth_eps=0.2)
    assert float(smoothed) > float(plain)
