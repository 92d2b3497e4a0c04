"""Predictor (serving path) tests."""

import jax
import numpy as np

from convnet_tpu.serve import Predictor
from convnet_tpu.utils.checkpoint import save_checkpoint
from convnet_tpu import models


def test_predictor_basic():
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  dtype="float32", batch_size=8, impl="xla")
    x = np.random.default_rng(0).random((5, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x)
    assert logits.shape == (5, 10)
    classes = p.predict(x)
    assert classes.shape == (5,)
    top3 = p.predict(x, topk=3)
    assert top3.shape == (5, 3)


def test_predictor_from_checkpoint(tmp_path):
    m = models.build("resnet", dataset="cifar10", depth=20)
    params, state = m.init(jax.random.PRNGKey(7))
    save_checkpoint({"params": params, "state": state, "epoch": 0},
                    False, str(tmp_path))
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  checkpoint=str(tmp_path), dtype="float32", batch_size=4,
                  impl="xla")
    x = np.random.default_rng(1).random((9, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x)
    assert logits.shape == (9, 10)
    # absorb-bn predictor must match the raw model's eval forward
    from convnet_tpu.core.module import Context
    import jax.numpy as jnp
    y_ref, _ = m(params, state, jnp.asarray(x), Context(train=False))
    np.testing.assert_allclose(logits, np.asarray(y_ref), rtol=1e-3,
                               atol=1e-3)


def test_predictor_uint8_input():
    p = Predictor("mnist", batch_size=4, dtype="float32", impl="xla")
    x = np.random.default_rng(0).integers(0, 256, (3, 28, 28, 1),
                                          dtype=np.uint8)
    logits = p.predict_logits(x)
    assert logits.shape == (3, 10)
