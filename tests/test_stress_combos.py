"""Feature-interaction stress tests on the 8-fake-device CPU mesh.

Single features are covered elsewhere; these runs exercise the
interactions users actually combine (reference main.py flag surface):
aux-classifier loss injection inside the shard_mapped step, and the
kitchen-sink CLI run (mixup + label smoothing + duplicates + chunked
accumulation + sync-BN + ZeRO-1 + weight EMA together).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu import models
from convnet_tpu.parallel.mesh import make_mesh
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 fake devices")]


def test_googlenet_aux_heads_train_on_mesh():
    """Aux losses are collected INSIDE the shard_mapped step; the aux
    head parameters must receive gradients and the step stay finite."""
    m = models.build("googlenet", aux_classifiers=True, num_classes=10)
    tr = Trainer(m, OptimRegime([{"epoch": 0, "optimizer": "SGD",
                                  "lr": 0.05, "momentum": 0.9}]),
                 num_classes=10,
                 config=TrainerConfig(dtype="float32", print_freq=0,
                                      sync_bn=True, chunk_batch=2),
                 mesh=make_mesh(8))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p0_aux = np.asarray(
        jax.tree_util.tree_leaves(p["aux1"])[0]).copy()
    p, s, o = tr.initialize(p, s)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16).astype(np.int32))
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    xs, ys = tr._shard(x, y)
    p, s, o, mt = step(p, s, o, xs, ys, hp, jax.random.PRNGKey(1))
    assert np.isfinite(float(mt["loss"]))
    assert np.isfinite(float(mt["grad_norm"]))
    p1_aux = np.asarray(jax.tree_util.tree_leaves(p["aux1"])[0])
    assert not np.allclose(p1_aux, p0_aux), "aux head got no gradient"


def test_cli_kitchen_sink_zero1_on_mesh(tmp_path):
    """mixup + label smoothing + duplicates + chunked accumulation +
    sync-BN + ZeRO-1 together, one epoch end-to-end (weight EMA is
    rejected with ZeRO by design — covered in the second combo)."""
    from convnet_tpu.cli.main import main
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "32", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "sink",
        "--mixup", "0.2", "--label-smoothing", "0.1",
        "--duplicates", "2", "--chunk-batch", "2",
        "--sync-bn", "--shard-opt-state",
    ])
    assert np.isfinite(res["best_prec1"])
    rows = json.loads((tmp_path / "sink" / "results.json").read_text())
    assert np.isfinite(rows[0]["train_loss"])


def test_cli_kitchen_sink_ema_on_mesh(tmp_path):
    """duplicates + adapt-grad-norm + weight EMA + sync-BN together."""
    from convnet_tpu.cli.main import main
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "32", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "sink2",
        "--duplicates", "2", "--adapt-grad-norm", "4",
        "--model-ema", "0.99", "--sync-bn",
    ])
    assert np.isfinite(res["best_prec1"])
