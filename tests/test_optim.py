"""Optimizer step parity vs torch.optim (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from convnet_tpu.regimes.optim import (
    make_update_fn, init_opt_state, HP_DEFAULTS, clip_by_global_norm,
)


def _hp(**kw):
    hp = {k: jnp.float32(v) for k, v in HP_DEFAULTS.items()}
    hp.update({k: jnp.float32(v) for k, v in kw.items()})
    return hp


def _run_parity(optimizer, torch_opt_fn, hp_kwargs, steps=5, rtol=1e-5):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"layer": {"w": jnp.asarray(w0)}}
    # mask selects 'w' → weight decay applies (matches torch param group)
    update = make_update_fn(optimizer, params)
    opt_state = init_opt_state(params, with_adam=True)

    wt = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch_opt_fn([wt])

    for i in range(steps):
        g = rng.standard_normal((4, 3)).astype(np.float32)
        grads = {"layer": {"w": jnp.asarray(g)}}
        params, opt_state = update(params, grads, opt_state, _hp(**hp_kwargs))
        wt.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(params["layer"]["w"]),
                               wt.detach().numpy(), rtol=rtol, atol=1e-5)


def test_sgd_momentum_matches_torch():
    _run_parity(
        "SGD",
        lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9,
                                   weight_decay=1e-4),
        dict(lr=0.1, momentum=0.9, weight_decay=1e-4))


def test_sgd_nesterov_matches_torch():
    _run_parity(
        "NesterovSGD",
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9, nesterov=True),
        dict(lr=0.05, momentum=0.9))


def test_adam_matches_torch():
    _run_parity(
        "Adam",
        lambda ps: torch.optim.Adam(ps, lr=1e-3, betas=(0.9, 0.999),
                                    eps=1e-8),
        dict(lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8), rtol=1e-4)


def test_adamw_matches_torch():
    _run_parity(
        "AdamW",
        lambda ps: torch.optim.AdamW(ps, lr=1e-3, weight_decay=0.01),
        dict(lr=1e-3, weight_decay=0.01), rtol=1e-4)


def test_wd_mask_excludes_bn_and_bias():
    params = {
        "conv": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.ones(8)},
        "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
    }
    update = make_update_fn("SGD", params)
    opt_state = init_opt_state(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    # with zero grads, only decoupled WD acts — and only on 'w'
    new_params, _ = update(params, zeros, opt_state,
                           _hp(lr=1.0, decoupled_weight_decay=0.5))
    assert float(new_params["conv"]["w"][0, 0, 0, 0]) == pytest.approx(0.5)
    assert float(new_params["conv"]["b"][0]) == pytest.approx(1.0)
    assert float(new_params["bn"]["scale"][0]) == pytest.approx(1.0)
    assert float(new_params["bn"]["bias"][0]) == pytest.approx(0.0)


def test_grad_clip():
    grads = {"w": jnp.full((10,), 3.0)}
    clipped, norm = clip_by_global_norm(grads, jnp.float32(1.0))
    assert float(norm) == pytest.approx(3.0 * np.sqrt(10), rel=1e-5)
    cn = float(jnp.sqrt(jnp.sum(jnp.square(clipped["w"]))))
    assert cn == pytest.approx(1.0, rel=1e-5)
    # disabled when max_norm < 0
    same, _ = clip_by_global_norm(grads, jnp.float32(-1.0))
    np.testing.assert_allclose(np.asarray(same["w"]), 3.0)


def _np_lars_step(w, g, mu, *, lr, eta, wd, mom, masked):
    """Independent numpy reference for one LARS leaf update."""
    if masked:
        w_norm = np.linalg.norm(w)
        g_norm = np.linalg.norm(g)
        trust = (eta * w_norm / (g_norm + wd * w_norm + 1e-9)
                 if (w_norm > 0 and g_norm > 0) else 1.0)
        g = g + wd * w
        scale = trust * lr
    else:
        scale = lr
    mu = mom * mu + scale * g
    return w - mu, mu


def test_lars_matches_numpy_reference():
    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    b0 = rng.standard_normal(4).astype(np.float32)
    params = {"fc": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}}
    update = make_update_fn("LARS", params)
    opt_state = init_opt_state(params)
    lr, eta, wd, mom = 2.0, 0.001, 1e-4, 0.9

    w, b = w0.copy(), b0.copy()
    mu_w = np.zeros_like(w)
    mu_b = np.zeros_like(b)
    for i in range(4):
        gw = rng.standard_normal(w.shape).astype(np.float32)
        gb = rng.standard_normal(b.shape).astype(np.float32)
        grads = {"fc": {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}}
        params, opt_state = update(params, grads, opt_state,
                                   _hp(lr=lr, trust_coef=eta,
                                       weight_decay=wd, momentum=mom))
        # weights get trust adaptation + wd; bias is plain SGD+momentum
        w, mu_w = _np_lars_step(w, gw, mu_w, lr=lr, eta=eta, wd=wd,
                                mom=mom, masked=True)
        b, mu_b = _np_lars_step(b, gb, mu_b, lr=lr, eta=eta, wd=wd,
                                mom=mom, masked=False)
    np.testing.assert_allclose(np.asarray(params["fc"]["w"]), w,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["fc"]["b"]), b,
                               rtol=1e-5, atol=1e-6)


def test_lamb_matches_numpy_reference():
    rng = np.random.default_rng(4)
    w0 = rng.standard_normal((6, 5)).astype(np.float32)
    params = {"fc": {"w": jnp.asarray(w0)}}
    update = make_update_fn("LAMB", params)
    opt_state = init_opt_state(params, with_adam=True, with_momentum=False)
    lr, wd, b1, b2, eps = 0.01, 0.01, 0.9, 0.999, 1e-8

    w = w0.copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    for t in range(1, 5):
        g = rng.standard_normal(w.shape).astype(np.float32)
        grads = {"fc": {"w": jnp.asarray(g)}}
        params, opt_state = update(params, grads, opt_state,
                                   _hp(lr=lr, weight_decay=wd, beta1=b1,
                                       beta2=b2, eps=eps))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        u = (m / (1 - b1 ** t)) / (np.sqrt(v / (1 - b2 ** t)) + eps) + wd * w
        ratio = np.linalg.norm(w) / (np.linalg.norm(u) + 1e-9)
        w = w - lr * ratio * u
    np.testing.assert_allclose(np.asarray(params["fc"]["w"]), w,
                               rtol=1e-5, atol=1e-6)


def test_lars_excludes_bn_from_trust_and_wd():
    """BN/bias leaves take the raw lr (no trust scaling, no wd) — the
    canonical LARS exclusion list."""
    params = {
        "conv": {"w": jnp.full((3, 3, 4, 8), 2.0)},
        "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
    }
    update = make_update_fn("LARS", params)
    opt_state = init_opt_state(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_params, _ = update(params, grads, opt_state,
                           _hp(lr=0.1, trust_coef=0.001, weight_decay=1e-4))
    # bn.scale: plain SGD step of lr*1.0
    assert float(new_params["bn"]["scale"][0]) == pytest.approx(0.9, abs=1e-6)
    # conv.w: step magnitude is lr*trust*(g + wd*w), orders smaller than lr
    dw = 2.0 - float(new_params["conv"]["w"][0, 0, 0, 0])
    w_norm = float(np.linalg.norm(np.full((3, 3, 4, 8), 2.0)))
    g_norm = float(np.linalg.norm(np.ones((3, 3, 4, 8))))
    trust = 0.001 * w_norm / (g_norm + 1e-4 * w_norm + 1e-9)
    assert dw == pytest.approx(0.1 * trust * (1.0 + 1e-4 * 2.0), rel=2e-3)


def test_lars_converges_on_quadratic():
    rng = np.random.default_rng(5)
    A = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    params = {"fc": {"w": jnp.zeros((8, 4), jnp.float32)}}
    loss_fn = lambda p: jnp.mean((A @ p["fc"]["w"] - y) ** 2)
    update = make_update_fn("LARS", params)
    opt_state = init_opt_state(params)
    # the trust ratio caps the relative step at ~trust_coef per step, so
    # LARS converges deliberately; compare against the exact lstsq
    # optimum (the problem is overdetermined — min loss is nonzero)
    hp = _hp(lr=1.0, trust_coef=0.05, momentum=0.9, weight_decay=0.0)
    w_opt, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(y), rcond=None)
    l_opt = float(np.mean((np.asarray(A) @ w_opt - np.asarray(y)) ** 2))
    for _ in range(150):
        grads = jax.grad(loss_fn)(params)
        params, opt_state = update(params, grads, opt_state, hp)
    assert float(loss_fn(params)) < 1.02 * l_opt


def test_large_lars_regime():
    """The LARS large-batch regime resolves through OptimRegime: warmup
    ramps, polynomial decay, trust_coef flows as an hp device scalar."""
    from convnet_tpu.models import build
    from convnet_tpu.regimes.optim import OptimRegime
    m = build("resnet", dataset="imagenet", depth=18,
              regime="large_lars", batch_size=4096, epochs=90)
    o = OptimRegime(list(m.regime))
    assert o.optimizer_name == "LARS"
    spe = 1281167 // 4096
    o.update(0, 0)
    hp0 = o.hyperparams()
    o.update(2, 2 * spe)
    hp_mid_warmup = o.hyperparams()
    o.update(5, 5 * spe)
    hp_peak = o.hyperparams()
    o.update(89, 89 * spe)
    hp_end = o.hyperparams()
    assert hp0["lr"] < hp_mid_warmup["lr"] < hp_peak["lr"]
    assert hp_peak["lr"] == pytest.approx(7.4, rel=1e-6)
    assert hp_end["lr"] < 0.01 * hp_peak["lr"]
    assert hp_peak["trust_coef"] == pytest.approx(0.001)
    assert hp_peak["weight_decay"] == pytest.approx(1e-4)
    assert "mu" in o.needed_slots


def test_bounded_weight_norm():
    """"Norm matters" regularizer: masked weights keep their init norm."""
    from convnet_tpu.regimes.optim import OptimRegime, make_update_fn
    rng = np.random.default_rng(0)
    params = {"conv": {"w": jnp.asarray(rng.standard_normal((3, 3, 4, 8)),
                                        jnp.float32),
                       "b": jnp.zeros(8)}}
    o = OptimRegime([{"epoch": 0, "optimizer": "SGD", "lr": 0.5,
                      "momentum": 0.9,
                      "regularizer": {"name": "BoundedWeightNorm"}}])
    assert o.uses_bounded_norm
    opt_state = o.init_state(params)
    update = make_update_fn("SGD", params, bounded_norm=True)
    hp = {k: jnp.float32(v) for k, v in o.hyperparams().items()}
    norm0 = float(jnp.sqrt(jnp.sum(jnp.square(params["conv"]["w"]))))
    p = params
    for i in range(3):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype), p)
        p, opt_state = update(p, grads, opt_state, hp)
        n = float(jnp.sqrt(jnp.sum(jnp.square(p["conv"]["w"]))))
        assert abs(n - norm0) < 1e-4 * norm0
    # weights actually moved (direction changes)
    assert not np.allclose(np.asarray(p["conv"]["w"]),
                           np.asarray(params["conv"]["w"]))
