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
