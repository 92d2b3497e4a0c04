"""Regime engine + OptimRegime unit tests (SURVEY.md §4 'Unit')."""

import pytest

from convnet_tpu.regimes.regime import Regime
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.regimes import schedules


def test_regime_epoch_triggers():
    r = Regime([
        {"epoch": 0, "lr": 0.1, "momentum": 0.9},
        {"epoch": 30, "lr": 0.01},
        {"epoch": 60, "lr": 0.001},
    ])
    r.update(0, 0)
    assert r.setting["lr"] == 0.1 and r.setting["momentum"] == 0.9
    changed = r.update(29, 100)
    assert not changed and r.setting["lr"] == 0.1
    assert r.update(30, 200)
    assert r.setting["lr"] == 0.01
    # earlier settings persist unless overridden
    assert r.setting["momentum"] == 0.9
    r.update(75, 300)
    assert r.setting["lr"] == 0.001


def test_regime_step_triggers_and_callables():
    warm = schedules.linear_warmup_lr(0.0, 1.0, 10)
    r = Regime([{"step": 0, "lr": warm}, {"step": 100, "lr": 0.5}])
    r.update(0, 0)
    assert r.get("lr") == pytest.approx(0.0)
    r.update(0, 5)
    assert r.get("lr") == pytest.approx(0.5)
    r.update(0, 50)
    assert r.get("lr") == pytest.approx(1.0)
    r.update(0, 100)
    assert r.get("lr") == 0.5


def test_regime_defaults_merge():
    r = Regime([{"epoch": 2, "batch_size": 64}], defaults={"batch_size": 128,
                                                           "shuffle": True})
    r.update(0, 0)
    assert r.setting["batch_size"] == 128
    r.update(2, 10)
    assert r.setting["batch_size"] == 64
    assert r.setting["shuffle"] is True


def test_optim_regime_hyperparams_and_switch():
    o = OptimRegime([
        {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
         "regularizer": {"name": "WeightDecay", "value": 1e-4}},
        {"epoch": 10, "optimizer": "Adam", "lr": 1e-3},
    ])
    o.update(0, 0)
    hp = o.hyperparams()
    assert hp["lr"] == 0.1
    assert hp["momentum"] == 0.9
    assert hp["decoupled_weight_decay"] == pytest.approx(1e-4)
    assert o.optimizer_name == "SGD"
    structural = o.update(10, 1000)
    assert structural  # optimizer class switched
    assert o.optimizer_name == "Adam"
    assert o.hyperparams()["lr"] == pytest.approx(1e-3)
    # slots allocated for both optimizers
    assert o.needed_slots == {"mu", "m", "v"}


def test_step_decay_and_cosine():
    lr = schedules.step_decay_lr(0.1, 0.1, 30)
    assert lr(0, 0) == pytest.approx(0.1)
    assert lr(30, 0) == pytest.approx(0.01)
    assert lr(60, 0) == pytest.approx(0.001)
    cos = schedules.cosine_lr(1.0, 100, warmup_steps=10)
    assert cos(0, 0) == pytest.approx(0.1)
    assert cos(0, 10) == pytest.approx(1.0)
    assert cos(0, 100) == pytest.approx(0.0, abs=1e-6)


def test_rescale_regime_lr_preserves_schedule_shape():
    """CLI --lr semantics (reference main.py:~30-140 flag surface): the
    override rescales the WHOLE embedded schedule — it must not revert
    to the model's values at the first phase boundary."""
    from convnet_tpu.regimes.regime import rescale_regime_lr
    from convnet_tpu import models

    regime = models.build("resnet", dataset="cifar10", depth=20).regime
    scaled = rescale_regime_lr(regime, 0.05)  # embedded base is 0.1
    o = OptimRegime(scaled)
    o.update(0, 0)
    assert o.hyperparams()["lr"] == pytest.approx(0.05)
    o.update(81, 10_000)  # past the first boundary (epoch 81: lr 1e-2)
    assert o.hyperparams()["lr"] == pytest.approx(0.005)
    o.update(122, 20_000)
    assert o.hyperparams()["lr"] == pytest.approx(0.0005)


def test_rescale_regime_lr_wraps_callables():
    from convnet_tpu.regimes.regime import rescale_regime_lr

    regime = [{"epoch": 0, "optimizer": "SGD",
               "lr": schedules.step_decay_lr(0.2, 0.1, 10)}]
    scaled = rescale_regime_lr(regime, 0.1)  # factor 0.5
    lr = scaled[0]["lr"]
    assert lr(0, 0) == pytest.approx(0.1)
    assert lr(10, 0) == pytest.approx(0.01)


def test_rescale_regime_lr_edge_cases():
    from convnet_tpu.regimes.regime import rescale_regime_lr

    out = rescale_regime_lr([{"epoch": 0, "optimizer": "SGD"}], 0.3)
    assert out[0]["lr"] == pytest.approx(0.3)
    with pytest.raises(ValueError):
        rescale_regime_lr([{"epoch": 0, "lr": 0.0}], 0.3)


def test_replace_regime_key_never_reverts():
    """--momentum/--optimizer/--weight-decay are flat replacements:
    injected in phase 0, stripped from every later phase."""
    from convnet_tpu.regimes.regime import replace_regime_key

    regime = [
        {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9},
        {"epoch": 30, "lr": 0.01, "momentum": 0.0},
    ]
    out = replace_regime_key(regime, "momentum", 0.5)
    o = OptimRegime(out)
    o.update(0, 0)
    assert o.hyperparams()["momentum"] == pytest.approx(0.5)
    o.update(30, 1000)
    assert o.hyperparams()["momentum"] == pytest.approx(0.5)
    assert o.hyperparams()["lr"] == pytest.approx(0.01)  # lr untouched


def test_rescale_regime_lr_warmup_schedule_uses_nominal_base():
    """Regression: the base of a warmup schedule is its NOMINAL (peak)
    lr, not f(0, 0) — the first warmup micro-step is ~lr/warmup_steps,
    and dividing by it blew the rescaled schedule up by ~warmup_steps
    (post-warmup lr 1251 instead of 0.05 on the RN50 cosine regime)."""
    from convnet_tpu.regimes.regime import rescale_regime_lr

    spe = 5004  # ImageNet B256 steps/epoch
    regime = [{"epoch": 0, "optimizer": "SGD",
               "lr": schedules.cosine_lr(0.1, 90 * spe, warmup_steps=5 * spe)}]
    scaled = rescale_regime_lr(regime, 0.05)
    lr = scaled[0]["lr"]
    assert lr(6, 6 * spe) == pytest.approx(0.05, rel=1e-2)   # post-warmup peak
    assert lr(0, 0) < 1e-4                                   # warmup ramp kept
    assert lr(90, 90 * spe) == pytest.approx(0.0, abs=1e-6)  # decay endpoint


def test_rescale_regime_lr_foreign_callable_probed():
    """A user-supplied lr callable without .base_lr is probed for its
    peak rather than trusted at (0, 0)."""
    from convnet_tpu.regimes.regime import rescale_regime_lr

    def foreign(epoch, step):  # warmup to 0.3 over 1k steps, then flat
        return 0.3 * min((step + 1) / 1000.0, 1.0)

    scaled = rescale_regime_lr([{"epoch": 0, "lr": foreign}], 0.15)
    lr = scaled[0]["lr"]
    assert lr(2, 10_000) == pytest.approx(0.15, rel=0.05)
