"""Flat-optimizer equivalence (regimes/optim.make_flat_update_fn).

The flattened update exists purely for dispatch economics — XLA emits
a tiny fusion per parameter leaf, which on many-leaf models costs more
than the update's bytes (Inception-v4, 449 leaves: 17.8 ms per-leaf
vs 2.6 ms flat; scripts/jobs/done/121_iv4_smallop_overhead). The math
must therefore be EQUIVALENT to the per-leaf path for every optimizer
in the registry, including the segment-summed LARS/LAMB layer norms
and the masked coupled/decoupled weight decay. These tests pin that,
plus the Trainer-level integration (EMA, grad-clip, resume adaptation
between tree and flat layouts via utils/checkpoint.adapt_opt_state).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from convnet_tpu.regimes.optim import (
    HP_DEFAULTS, OPTIMIZERS, OptimRegime, make_flat_update_fn,
    make_update_fn, init_opt_state)
from convnet_tpu.utils.param_filter import wd_mask


def _params(seed=0):
    """A small tree mixing conv weights, biases and BN affine leaves so
    the default wd_mask is non-trivial."""
    r = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
    return {
        "conv1": {"w": f(3, 3, 3, 8), "b": f(8)},
        "bn1": {"scale": f(8) * 0.1 + 1.0, "bias": f(8)},
        "fc": {"w": f(8, 10), "b": f(10)},
    }


def _grads(seed):
    r = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.standard_normal(p.shape) * 1e-2,
                              jnp.float32), _params())


def _hp(**over):
    hp = {k: jnp.float32(v) for k, v in HP_DEFAULTS.items()}
    hp.update({k: jnp.float32(v) for k, v in over.items()})
    return hp


@pytest.mark.parametrize("name", sorted(OPTIMIZERS))
def test_flat_matches_tree(name):
    params = _params()
    mask = wd_mask(params)
    tree_fn = jax.jit(make_update_fn(name, params, mask))
    flat_fn = jax.jit(make_flat_update_fn(name, params, mask))

    spec = OPTIMIZERS[name]
    with_adam = bool({"m", "v"} & set(spec["slots"]))
    with_mom = "mu" in spec["slots"]
    o_tree = init_opt_state(params, with_adam=with_adam,
                            with_momentum=with_mom)
    flat0, unravel = ravel_pytree(params)
    o_flat = init_opt_state(jnp.zeros((flat0.size,), jnp.float32),
                            with_adam=with_adam, with_momentum=with_mom)

    hp = _hp(lr=0.05, momentum=0.9, weight_decay=1e-2,
             decoupled_weight_decay=1e-3, trust_coef=0.01)
    p_tree, p_flat = params, flat0
    for step in range(5):
        g = _grads(step + 10)
        p_tree, o_tree = tree_fn(p_tree, g, o_tree, hp)
        gf, _ = ravel_pytree(g)
        p_flat, o_flat = flat_fn(p_flat, gf, o_flat, hp)
        ref, _ = ravel_pytree(p_tree)
        np.testing.assert_allclose(np.asarray(p_flat), np.asarray(ref),
                                   rtol=2e-6, atol=2e-7,
                                   err_msg=f"{name} step {step}")
    # moments agree too (same layout as params)
    for slot in spec["slots"]:
        ref, _ = ravel_pytree(o_tree[slot])
        np.testing.assert_allclose(np.asarray(o_flat[slot]),
                                   np.asarray(ref), rtol=2e-6, atol=2e-7)
    assert int(o_flat["step"]) == 5


def _tiny_trainer(flat, model_ema=0.0, grad_clip=-1.0, seed=0):
    from convnet_tpu import models
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    model = models.build("mnist")
    optim = OptimRegime([{"epoch": 0, "optimizer": "SGD", "lr": 0.05,
                          "momentum": 0.9,
                          "regularizer": {"name": "WeightDecay",
                                          "value": 1e-4}}])
    tr = Trainer(model, optim, 10,
                 TrainerConfig(print_freq=0, flat_optim=flat,
                               model_ema=model_ema, grad_clip=grad_clip),
                 seed=seed)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, opt = tr.initialize(params, state)
    return tr, params, state, opt


def _run_steps(tr, params, state, opt, n=4, b=16):
    step = tr._get_train_step()
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    r = np.random.default_rng(0)
    rng = jax.random.PRNGKey(7)
    gnorm = None
    for i in range(n):
        x = jnp.asarray(r.standard_normal((b, 28, 28, 1)), jnp.float32)
        y = jnp.asarray(r.integers(0, 10, b), jnp.int32)
        params, state, opt, mt = step(params, state, opt, x, y, hp, rng)
        gnorm = mt["grad_norm"]
    return params, state, opt, float(gnorm)


def test_trainer_flat_matches_tree_end_to_end():
    """Whole jitted train step: flat_optim on/off produce the same
    parameters, grad-norm metric and EMA after several steps."""
    tr1, p1, s1, o1 = _tiny_trainer(flat=True, model_ema=0.9,
                                    grad_clip=1.0)
    tr2, p2, s2, o2 = _tiny_trainer(flat=False, model_ema=0.9,
                                    grad_clip=1.0)
    p1, s1, o1, gn1 = _run_steps(tr1, p1, s1, o1)
    p2, s2, o2, gn2 = _run_steps(tr2, p2, s2, o2)
    f1, _ = ravel_pytree(p1)
    f2, _ = ravel_pytree(p2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)
    assert abs(gn1 - gn2) <= 1e-5 * max(gn1, 1.0)
    assert getattr(o1["ema"], "ndim", None) == 1  # stored flat
    e1, _ = ravel_pytree(tr1.ema_params(o1))
    e2, _ = ravel_pytree(tr2.ema_params(o2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-5, atol=1e-6)


def test_resume_tree_checkpoint_into_flat_run():
    """adapt_opt_state lifts a per-leaf (tree) momentum checkpoint into
    the flat layout: continuing flat matches continuing tree."""
    from convnet_tpu.utils.checkpoint import adapt_opt_state
    tr_t, p_t, s_t, o_t = _tiny_trainer(flat=False)
    p_t, s_t, o_t, _ = _run_steps(tr_t, p_t, s_t, o_t, n=3)

    # "save" the tree-layout opt state, "resume" into a flat trainer
    saved = jax.tree_util.tree_map(np.asarray, o_t)
    tr_f, p_f, s_f, o_f = _tiny_trainer(flat=True)
    o_f = adapt_opt_state(saved, o_f)
    assert getattr(o_f["mu"], "ndim", None) == 1

    copy = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), t)
    p_snap, s_snap = copy(p_t), copy(s_t)
    p_t2, _, _, _ = _run_steps(tr_t, p_t, s_t, o_t, n=2)
    p_f2, _, _, _ = _run_steps(tr_f, p_snap, s_snap, o_f, n=2)
    f1, _ = ravel_pytree(p_t2)
    f2, _ = ravel_pytree(p_f2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)
