"""Integration tests: short training runs, checkpoint→resume
continuation, chunked micro-batching, duplicates TTA (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu import models
from convnet_tpu.data.data_regime import DataRegime
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


pytestmark = pytest.mark.slow


def _make(model_cfg=None, lr=None, **cfg_kwargs):
    model = models.build("resnet", dataset="cifar10",
                         **(model_cfg or {"depth": 20}))
    regime = model.regime
    if lr is not None:
        regime = [{**regime[0], "lr": lr}] + regime[1:]
    optim = OptimRegime(regime)
    trainer = Trainer(model, optim, 10,
                      TrainerConfig(print_freq=0, **cfg_kwargs), seed=3)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, opt_state = trainer.initialize(params, state)
    return model, trainer, params, state, opt_state


def _loader(epoch=0, n=8, b=32, size=32):
    data = DataRegime(defaults={"name": "synthetic", "batch_size": b,
                                "dataset_kwargs": {"size": n * b,
                                                   "image_size": size}})
    data.set_epoch(epoch)
    return data.get_loader()


def test_loss_decreases():
    # modest lr: the synthetic labels are random, so this is a
    # memorization test — the classic 0.1 regime oscillates on it
    model, tr, params, state, opt_state = _make(lr=0.02)
    losses = []
    for epoch in range(4):
        # same data every epoch → memorizable
        params, state, opt_state, res = tr.train_epoch(
            _loader(0), params, state, opt_state, epoch)
        losses.append(res["loss"])
    assert min(losses[1:]) < losses[0], losses


def test_progressive_resizing_across_epochs():
    """Mix&Match-style data regime: the input size changes between
    epochs (data.py:~270–300 set_epoch semantics); the jitted step
    re-specializes per shape via jit's cache and training continues
    through the size change."""
    model, tr, params, state, opt_state = _make(lr=0.02)
    data = DataRegime(
        [{"epoch": 0, "input_size": 24}, {"epoch": 1, "input_size": 32}],
        defaults={"name": "synthetic", "batch_size": 32,
                  "dataset_kwargs": {"size": 64, "image_size": 32}})
    for epoch, want in ((0, 24), (1, 32)):
        data.set_epoch(epoch)
        x, _ = next(iter(data.get_loader()))
        assert x.shape[1] == want
        params, state, opt_state, res = tr.train_epoch(
            data.get_loader(), params, state, opt_state, epoch)
        assert np.isfinite(res["loss"])


def test_chunk_batch_matches_full_batch_grads():
    """Micro-batched gradient accumulation ≈ full-batch step (BN stats
    differ per-chunk, so compare loosely after 1 step)."""
    _, tr1, p1, s1, o1 = _make(chunk_batch=1)
    _, tr2, p2, s2, o2 = _make(chunk_batch=4)
    x = np.random.default_rng(0).standard_normal((32, 32, 32, 3)).astype(np.float32)
    y = np.zeros(32, np.int32)
    for tr, p, s, o in ((tr1, p1, s1, o1), (tr2, p2, s2, o2)):
        tr.optim.update(0, 0)
    hp1 = tr1._hp_device(tr1.optim.hyperparams())
    step1 = tr1._get_train_step()
    step2 = tr2._get_train_step()
    r = jax.random.PRNGKey(5)
    p1n, _, _, m1 = step1(p1, s1, o1, jnp.asarray(x), jnp.asarray(y), hp1, r)
    p2n, _, _, m2 = step2(p2, s2, o2, jnp.asarray(x), jnp.asarray(y), hp1, r)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=0.1)


def test_checkpoint_resume_bitwise(tmp_path):
    """Save → load → continue must produce identical params to an
    uninterrupted run (optimizer state incl. momentum restored)."""
    model, tr, params, state, opt_state = _make()
    loader0 = list(_loader(0))
    loader1 = list(_loader(1))

    # run 2 epochs straight
    p, s, o = params, state, opt_state
    p, s, o, _ = tr.train_epoch(loader0, p, s, o, 0)
    ckpt_file = save_checkpoint(
        {"epoch": 0, "params": p, "state": s, "opt_state": o,
         "training_steps": tr.training_steps}, False, str(tmp_path))
    p, s, o, _ = tr.train_epoch(loader1, p, s, o, 1)
    straight = jax.device_get(p)

    # resume from the checkpoint with a fresh trainer
    model2, tr2, _, _, _ = _make()
    ckpt = load_checkpoint(ckpt_file)
    tr2.training_steps = int(ckpt["training_steps"])
    tr2.rng = tr.__class__(model2, tr2.optim, 10).rng  # same seed path
    tr2.rng = jax.random.PRNGKey(3)
    # fast-forward trainer rng: one split per step taken in epoch 0
    for _ in range(len(loader0)):
        tr2.rng, _ = jax.random.split(tr2.rng)
    p2, s2, o2, _ = tr2.train_epoch(loader1, ckpt["params"], ckpt["state"],
                                    ckpt["opt_state"], 1)
    resumed = jax.device_get(p2)
    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_duplicates_tta_eval():
    model, tr, params, state, opt_state = _make(duplicates=2,
                                                average_output=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    x = np.repeat(x, 2, axis=0)  # duplicate pairs
    y = np.repeat(rng.integers(0, 10, 16), 2).astype(np.int32)
    res = tr.validate([(x, y)], params, state)
    assert np.isfinite(res["loss"])


def test_mixup_training_runs():
    model, tr, params, state, opt_state = _make(mixup_alpha=0.5,
                                                label_smoothing=0.1)
    params, state, opt_state, res = tr.train_epoch(
        _loader(), params, state, opt_state, 0)
    assert np.isfinite(res["loss"])


def test_grad_clip_bounds_update():
    model, tr, params, state, opt_state = _make(grad_clip=0.01)
    params, state, opt_state, res = tr.train_epoch(
        _loader(n=2), params, state, opt_state, 0)
    assert np.isfinite(res["loss"])


def test_calibrate_bn():
    model, tr, params, state, opt_state = _make()
    new_state = tr.calibrate_bn(_loader(n=2), params, state, num_steps=2)
    # calibrated stats differ from init (mean 0 / var 1)
    m = new_state["stem"]["bn"]["mean"]
    assert float(jnp.max(jnp.abs(m))) > 0


def test_calibrate_bn_respects_bn_momentum():
    """recover() must invert each BN layer's OWN EMA momentum — with a
    hardcoded 0.1 a momentum=0.01 layer's recovered moments would be
    dominated by the stale running stats (review fix, round 3)."""
    from convnet_tpu.core.module import Module
    from convnet_tpu.nn.layers import BatchNorm2d, Conv2d

    class Tiny(Module):
        def __init__(self, momentum):
            self.conv = Conv2d(3, 8, 3, padding=1)
            self.bn = BatchNorm2d(8, momentum=momentum)

        def __call__(self, params, state, x, ctx):
            y, _ = self.conv(params["conv"], {}, x, ctx)
            y, s = self.bn(params["bn"], state["bn"], y, ctx)
            return y, {"bn": s}

    batch = [(np.random.default_rng(0)
              .standard_normal((16, 8, 8, 3)).astype(np.float32),
              np.zeros(16, np.int32))]
    stats = {}
    for m in (0.1, 0.01):
        model = Tiny(momentum=m)
        optim = OptimRegime([{"optimizer": "SGD", "lr": 0.1}])
        tr = Trainer(model, optim, 10, TrainerConfig(print_freq=0))
        params, state = model.init(jax.random.PRNGKey(0))
        stats[m] = tr.calibrate_bn(batch, params, state, num_steps=1)
    # the recovered BATCH moments are a property of the data alone —
    # identical whatever EMA momentum the layer was built with
    np.testing.assert_allclose(
        np.asarray(stats[0.1]["bn"]["mean"]),
        np.asarray(stats[0.01]["bn"]["mean"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats[0.1]["bn"]["var"]),
        np.asarray(stats[0.01]["bn"]["var"]), rtol=1e-4, atol=1e-5)


def _one_step(tr, params, state, opt_state, x, y, rng_seed=5):
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    return step(params, state, opt_state, jnp.asarray(x), jnp.asarray(y),
                hp, jax.random.PRNGKey(rng_seed))


def test_loss_scale_invariance():
    """--loss-scale S must be a numerical no-op in fp32: the loss is
    multiplied by S before differentiation and the gradients divided by
    S after (reference train.py:~(_step) semantics) — reported loss,
    grad_norm, and the post-step params are invariant to S.

    Regression: round 1 only had the unscale division, so S silently
    divided the effective learning rate by S."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)

    results = {}
    for s in (1.0, 8.0, 4096.0):
        model, tr, params, state, opt_state = _make(
            model_cfg={"depth": 8}, loss_scale=s)
        p, st, o, m = _one_step(tr, params, state, opt_state, x, y)
        results[s] = (float(m["loss"]), float(m["grad_norm"]),
                      jax.device_get(p))

    loss1, gn1, p1 = results[1.0]
    for s in (8.0, 4096.0):
        loss_s, gn_s, p_s = results[s]
        assert loss_s == pytest.approx(loss1, rel=1e-5)
        assert gn_s == pytest.approx(gn1, rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p_s)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)


def test_model_ema_tracks_recurrence():
    """opt_state['ema'] follows e ← d·e + (1−d)·p exactly, starting
    from the initial params; CLI validation consumes it via
    Trainer.ema_params."""
    d = 0.9
    model, tr, params, state, opt_state = _make(model_cfg={"depth": 8},
                                                model_ema=d)
    assert "ema" in opt_state
    rng = np.random.default_rng(5)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)

    manual = jax.device_get(params)
    p, s, o = params, state, opt_state
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    for i in range(3):
        p, s, o, _ = step(p, s, o, jnp.asarray(x), jnp.asarray(y), hp,
                          jax.random.PRNGKey(i))
        manual = jax.tree_util.tree_map(
            lambda e, q: e * d + np.asarray(q) * (1 - d), manual,
            jax.device_get(p))
    ema = tr.ema_params(o)
    assert ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(manual),
                    jax.tree_util.tree_leaves(jax.device_get(ema))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)
    # EMA differs from the live params (it lags) but stays close
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p)),
                    jax.tree_util.tree_leaves(jax.device_get(ema))):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_fp16_policy_with_loss_scale_trains():
    """True float16 compute (the reference's --dtype half lineage,
    fp16 names in core/dtypes.py) with static loss scaling: one step
    produces finite, nonzero gradients and finite loss."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)
    model, tr, params, state, opt_state = _make(
        model_cfg={"depth": 8}, dtype="fp16", loss_scale=1024.0)
    _, _, _, m = _one_step(tr, params, state, opt_state, x, y)
    assert np.isfinite(float(m["loss"]))
    gn = float(m["grad_norm"])
    assert np.isfinite(gn) and gn > 1e-3


def test_loss_scale_bf16_stays_finite():
    """Large static loss scale under the bf16 policy: gradients must
    neither flush to zero nor overflow to inf after the unscale."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)
    model, tr, params, state, opt_state = _make(
        model_cfg={"depth": 8}, dtype="bf16", loss_scale=4096.0)
    _, _, _, m = _one_step(tr, params, state, opt_state, x, y)
    gn = float(m["grad_norm"])
    assert np.isfinite(gn) and gn > 1e-3


def test_adapt_grad_norm_identical_duplicates_scale_is_one():
    """Constructed case: duplicates that are EXACT copies. The mean
    gradient over the duplicated batch equals the gradient over one
    copy per sample, so the faithful single-duplicate reference slice
    (x[::d], one copy per distinct sample) must measure scale ≈ 1.

    Regression: the round-1 leading-block slice x[:b//d] held b/d²
    distinct samples × d copies each (loaders pack duplicates
    contiguously), which measures a different gradient and a scale
    far from 1."""
    model, tr, params, state, opt_state = _make(
        model_cfg={"depth": 8}, duplicates=2, adapt_grad_norm=1)
    rng = np.random.default_rng(2)
    x = np.repeat(rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
                  2, axis=0)
    y = np.repeat(rng.integers(0, 10, 8), 2).astype(np.int32)
    _, _, opt_state, _ = _one_step(tr, params, state, opt_state, x, y)
    scale = float(opt_state["agn_scale"])
    assert scale == pytest.approx(1.0, abs=5e-3), scale


def test_adapt_grad_norm():
    """Batch-augmentation gradient rescaling runs and caches its scale."""
    model, tr, params, state, opt_state = _make(duplicates=2,
                                                adapt_grad_norm=2)
    assert "agn_scale" in opt_state
    rng = np.random.default_rng(0)
    x = np.repeat(rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
                  2, axis=0)
    y = np.repeat(rng.integers(0, 10, 8), 2).astype(np.int32)
    params, state, opt_state, res = tr.train_epoch(
        [(x, y)] * 3, params, state, opt_state, 0, steps_per_epoch=3)
    assert np.isfinite(res["loss"])
    assert float(opt_state["agn_scale"]) > 0
