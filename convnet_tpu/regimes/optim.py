"""Optimizers + OptimRegime — regime-driven optimization.

Rebuild of utils/optim.py:~15–280 (approx., SURVEY.md §2.2): an
``OptimRegime`` owns the optimizer and re-configures it whenever its
regime fires — it can switch optimizer *class* by name, set
lr/momentum/weight-decay per step, and instantiate regularizers from
specs like ``{'regularizer': {'name': 'WeightDecay', 'value': 1e-4}}``.

TPU-native split:
- The *step math* is a pure jittable function
  ``update_fn(params, grads, opt_state, hp)`` built once per optimizer
  name (static); **all hyperparameters enter as device scalars** in
  ``hp`` so per-step regime changes (lr schedules, warmup ramps) never
  recompile.
- ``OptimRegime`` runs outside jit: it resolves the regime each step
  (utils/regime.py semantics) and emits the ``hp`` dict. Switching
  optimizer class is a *structural* change → the trainer re-jits
  (mirrors the reference rebuilding its torch.optim object).

Optimizer state is a superset pytree: momentum buffer ``mu`` (SGD) and
first/second moments ``m``/``v`` (Adam family), allocated only when the
regime can reach the corresponding optimizer.

torch-semantics notes: coupled weight decay is added to the gradient
*before* the momentum update (as in torch.optim.SGD); decoupled
WeightDecay (the reference's regularizer path) multiplies params by
``(1 - lr*wd)`` at step time (AdamW convention).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from convnet_tpu.regimes.regime import Regime
from convnet_tpu.utils.param_filter import wd_mask

_ZERO = 0.0

# hyperparameter defaults fed to every update_fn; regime settings override
HP_DEFAULTS: Dict[str, float] = {
    "lr": 0.1,
    "momentum": 0.0,
    "dampening": 0.0,
    "weight_decay": 0.0,        # coupled L2 (torch SGD-style), masked
    "decoupled_weight_decay": 0.0,  # decoupled (regularizer path), masked
    "beta1": 0.9,
    "beta2": 0.999,
    "eps": 1e-8,
    "alpha": 0.99,              # RMSprop smoothing
    "grad_clip": -1.0,          # global-norm clip; <0 disables
    "loss_scale": 1.0,
    "bounded_norm": 0.0,        # >0 → BoundedWeightNorm active
    "trust_coef": 0.001,        # LARS eta / LAMB has no coef (ratio direct)
}


def _tree_mul(tree, scalar):
    return jax.tree_util.tree_map(lambda t: t * scalar, tree)


def _masked(mask_tree, tree):
    """Zero out leaves where mask is False."""
    return jax.tree_util.tree_map(
        lambda m, t: t if m else jnp.zeros_like(t), mask_tree, tree)


def global_norm(tree):
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves))


def clip_by_global_norm(grads, max_norm):
    """Clip when max_norm > 0; identity otherwise (branch-free)."""
    norm = global_norm(grads)
    scale = jnp.where(
        (max_norm > 0) & (norm > max_norm),
        max_norm / jnp.maximum(norm, 1e-12),
        1.0,
    )
    return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads), norm


def init_opt_state(params, with_adam: bool = False, with_momentum: bool = True):
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    state: Dict[str, Any] = {"step": jnp.zeros((), jnp.int32)}
    if with_momentum:
        state["mu"] = zeros()
    if with_adam:
        state["m"] = zeros()
        state["v"] = zeros()
    return state


def _apply_wd(params, grads, hp, mask01):
    """Coupled L2 into grads (masked); returns modified grads."""
    return jax.tree_util.tree_map(
        lambda g, p, m: g + hp["weight_decay"] * m * p.astype(g.dtype),
        grads, params, mask01)


def sgd_step(params, grads, opt_state, hp, *, nesterov=False, mask01=None):
    """torch.optim.SGD semantics with momentum/dampening/nesterov."""
    grads = _apply_wd(params, grads, hp, mask01)
    mu = jax.tree_util.tree_map(
        lambda b, g: hp["momentum"] * b + (1.0 - hp["dampening"]) * g,
        opt_state["mu"], grads)
    if nesterov:
        d = jax.tree_util.tree_map(
            lambda g, b: g + hp["momentum"] * b, grads, mu)
    else:
        d = mu
    decay = 1.0 - hp["lr"] * hp["decoupled_weight_decay"]
    new_params = jax.tree_util.tree_map(
        lambda p, g, m: (p * jnp.where(m > 0, decay, 1.0)) - hp["lr"] * g,
        params, d, mask01)
    return new_params, {**opt_state, "mu": mu, "step": opt_state["step"] + 1}


def adam_step(params, grads, opt_state, hp, *, adamw=False, mask01=None):
    grads = _apply_wd(params, grads, hp, mask01)
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    b1, b2 = hp["beta1"], hp["beta2"]
    m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                               opt_state["m"], grads)
    v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * jnp.square(g),
                               opt_state["v"], grads)
    c1 = 1.0 - jnp.power(b1, t)
    c2 = 1.0 - jnp.power(b2, t)
    wd = hp["decoupled_weight_decay"] + (hp["weight_decay"] if adamw else 0.0)
    decay = 1.0 - hp["lr"] * wd
    new_params = jax.tree_util.tree_map(
        lambda p, m_, v_, msk: (p * jnp.where(msk > 0, decay, 1.0))
        - hp["lr"] * (m_ / c1) / (jnp.sqrt(v_ / c2) + hp["eps"]),
        params, m, v, mask01)
    return new_params, {**opt_state, "m": m, "v": v, "step": step}


def rmsprop_step(params, grads, opt_state, hp, *, mask01=None):
    grads = _apply_wd(params, grads, hp, mask01)
    step = opt_state["step"] + 1
    v = jax.tree_util.tree_map(
        lambda v_, g: hp["alpha"] * v_ + (1 - hp["alpha"]) * jnp.square(g),
        opt_state["v"], grads)
    d = jax.tree_util.tree_map(
        lambda g, v_: g / (jnp.sqrt(v_) + hp["eps"]), grads, v)
    mu = jax.tree_util.tree_map(
        lambda b, g: hp["momentum"] * b + g, opt_state["mu"], d)
    decay = 1.0 - hp["lr"] * hp["decoupled_weight_decay"]
    new_params = jax.tree_util.tree_map(
        lambda p, g, m: (p * jnp.where(m > 0, decay, 1.0)) - hp["lr"] * g,
        params, mu, mask01)
    return new_params, {**opt_state, "mu": mu, "v": v, "step": step}


def _leaf_norm(x):
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32))))


def lars_step(params, grads, opt_state, hp, *, mask01=None):
    """LARS (You et al. 2017) — layer-wise adaptive rate scaling for
    large-batch SGD. Beyond the reference's optimizer registry
    (utils/optim.py:~230–280 approx. has torch.optim names only), but
    directly on its large-batch lineage: the reference's 'large' regime
    implements Goyal-style warmup (models/resnet.py:~260–380 approx.);
    LARS is the standard continuation past batch ~8k.

    Per-leaf, for LARS-eligible leaves (mask>0, i.e. conv/linear
    weights): trust = eta*||w|| / (||g|| + wd*||w||); momentum update
    folds lr*trust into the gradient accumulation (momentum-after-
    scaling formulation used by the MLPerf reference implementations).
    Excluded leaves (bias/BN, mask==0) take plain SGD+momentum with no
    weight decay — the canonical exclusion list.
    """
    lr, eta, wd, mom = hp["lr"], hp["trust_coef"], hp["weight_decay"], hp["momentum"]

    def leaf(p, g, b, m):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        w_norm = _leaf_norm(p32)
        g_norm = _leaf_norm(g)
        trust = jnp.where(
            (w_norm > 0) & (g_norm > 0),
            eta * w_norm / (g_norm + wd * w_norm + 1e-9), 1.0)
        # mask==0 → no wd, no trust adaptation
        g = g + (wd * m) * p32
        scale = jnp.where(m > 0, trust, 1.0) * lr
        new_b = mom * b + scale * g
        return (p32 - new_b).astype(p.dtype), new_b

    flat = jax.tree_util.tree_map(leaf, params, grads, opt_state["mu"], mask01)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
    mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                is_leaf=lambda t: isinstance(t, tuple))
    return new_params, {**opt_state, "mu": mu, "step": opt_state["step"] + 1}


def lamb_step(params, grads, opt_state, hp, *, mask01=None):
    """LAMB (You et al. 2019) — Adam moments + layer-wise trust ratio
    r = ||w||/||update||, for large-batch Adam-family training. Trust
    adaptation and decoupled weight decay apply to eligible leaves only
    (mask>0); bias/BN leaves take the plain Adam update."""
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    b1, b2 = hp["beta1"], hp["beta2"]
    lr, wd, eps = hp["lr"], hp["weight_decay"], hp["eps"]
    c1 = 1.0 - jnp.power(b1, t)
    c2 = 1.0 - jnp.power(b2, t)

    def leaf(p, g, m_, v_, msk):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        m2 = b1 * m_ + (1 - b1) * g
        v2 = b2 * v_ + (1 - b2) * jnp.square(g)
        u = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps) + (wd * msk) * p32
        w_norm = _leaf_norm(p32)
        u_norm = _leaf_norm(u)
        ratio = jnp.where((msk > 0) & (w_norm > 0) & (u_norm > 0),
                          w_norm / (u_norm + 1e-9), 1.0)
        return (p32 - lr * ratio * u).astype(p.dtype), m2, v2

    flat = jax.tree_util.tree_map(leaf, params, grads,
                                  opt_state["m"], opt_state["v"], mask01)
    is3 = lambda t: isinstance(t, tuple)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is3)
    m = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is3)
    v = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=is3)
    return new_params, {**opt_state, "m": m, "v": v, "step": step}


OPTIMIZERS = {
    "SGD": dict(step=sgd_step, kwargs={}, slots=("mu",)),
    "NesterovSGD": dict(step=sgd_step, kwargs={"nesterov": True}, slots=("mu",)),
    "Adam": dict(step=adam_step, kwargs={}, slots=("m", "v")),
    "AdamW": dict(step=adam_step, kwargs={"adamw": True}, slots=("m", "v")),
    "RMSprop": dict(step=rmsprop_step, kwargs={}, slots=("mu", "v")),
    "LARS": dict(step=lars_step, kwargs={}, slots=("mu",)),
    "LAMB": dict(step=lamb_step, kwargs={}, slots=("m", "v")),
}


def make_update_fn(optimizer: str, params_template, wd_mask_tree=None,
                   bounded_norm: bool = False):
    """Build the pure ``update(params, grads, opt_state, hp)`` for a
    (static) optimizer name. ``wd_mask_tree`` is a bool pytree selecting
    weight-decay-eligible leaves (default: weights only). With
    ``bounded_norm`` the "Norm matters" post-step renormalization runs,
    gated at runtime by ``hp['bounded_norm']`` (opt_state must carry
    the reference norms under 'norms')."""
    spec = OPTIMIZERS[optimizer]
    mask = wd_mask_tree if wd_mask_tree is not None else wd_mask(params_template)
    mask01 = jax.tree_util.tree_map(lambda m: jnp.float32(1.0 if m else 0.0), mask)

    def update(params, grads, opt_state, hp):
        new_params, new_state = spec["step"](params, grads, opt_state, hp,
                                             mask01=mask01, **spec["kwargs"])
        if bounded_norm:
            from convnet_tpu.regimes.regularization import bounded_weight_norm
            renormed = bounded_weight_norm(new_params, new_state["norms"], mask)
            active = hp["bounded_norm"] > 0
            new_params = jax.tree_util.tree_map(
                lambda r, p: jnp.where(active, r, p), renormed, new_params)
        return new_params, new_state

    return update


def _flat_leaf_meta(params_template, mask_tree):
    """Static flat-layout metadata in ``ravel_pytree`` leaf order:
    (sizes, wd-flags) per leaf. Works on ShapeDtypeStruct templates."""
    import numpy as np
    leaves = jax.tree_util.tree_leaves(params_template)
    flags = [bool(f) for f in jax.tree_util.tree_leaves(mask_tree)]
    sizes = [int(np.prod(l.shape)) if len(l.shape) else 1 for l in leaves]
    return sizes, flags


def make_flat_update_fn(optimizer: str, params_template, wd_mask_tree=None):
    """Flattened-update twin of ``make_update_fn``: identical math, but
    executed on ONE concatenated fp32 vector instead of per-leaf ops.

    Why: XLA emits a separate tiny fusion per parameter leaf, each with
    a fixed dispatch cost. On Inception-v4 (449 leaves, 42.7M params)
    the per-leaf SGD+momentum update costs 17.8 ms/step vs 2.6 ms flat
    (6.8×, scripts/jobs/done/121_iv4_smallop_overhead) — ~10% of the
    whole train step lost to dispatch. The trainer ravels params/grads
    once, applies this update, and unravels the result; optimizer
    moments live flat across steps (checkpoints adapt either way via
    utils/checkpoint.adapt_opt_state).

    The weight-decay mask becomes a static flat bool vector (1 B/elem;
    elementwise ops promote it in-fusion, nothing materializes f32).
    LARS/LAMB recover per-LAYER norms from the flat vector with the
    same segment-sum machinery the ZeRO-1 path uses
    (parallel/zero.py, axis_name=None → no collective).

    BoundedWeightNorm regimes need per-leaf renormalization of the
    parameter tree — callers keep the tree path for those.
    """
    import numpy as np
    spec = OPTIMIZERS[optimizer]
    mask = wd_mask_tree if wd_mask_tree is not None else wd_mask(params_template)
    sizes, flags = _flat_leaf_meta(params_template, mask)
    mask01 = jnp.asarray(np.concatenate(
        [np.full(n, f, np.bool_) for n, f in zip(sizes, flags)]))

    if optimizer in ("LARS", "LAMB"):
        from convnet_tpu.parallel import zero
        seg = jnp.asarray(np.concatenate(
            [np.full(n, i, np.int32) for i, n in enumerate(sizes)]))
        leaf_mask = jnp.asarray([1.0 if f else 0.0 for f in flags],
                                jnp.float32)
        n_leaves = len(sizes)

        def update(flat_p, flat_g, opt_state, hp):
            w_sq = zero.segment_sq_sums(flat_p.astype(jnp.float32), seg,
                                        n_leaves + 1, None)[:n_leaves]
            if optimizer == "LARS":
                return zero.lars_step_sharded(
                    flat_p, flat_g, opt_state, hp, mask01=mask01,
                    seg_slice=seg, w_sq=w_sq, n_leaves=n_leaves,
                    axis_name=None)
            return zero.lamb_step_sharded(
                flat_p, flat_g, opt_state, hp, mask01=mask01,
                seg_slice=seg, w_sq=w_sq, leaf_mask=leaf_mask,
                n_leaves=n_leaves, axis_name=None)

        return update

    def update(flat_p, flat_g, opt_state, hp):
        return spec["step"](flat_p, flat_g, opt_state, hp,
                            mask01=mask01, **spec["kwargs"])

    return update


class OptimRegime:
    """Regime-driven optimizer configuration (outside-jit half).

    ``update(epoch, train_steps)`` resolves the regime;
    ``hyperparams()`` returns the dense hp dict for the jitted step;
    ``optimizer_name`` is the static optimizer class (a change of which
    signals the trainer to re-jit, returned by ``update``).
    """

    def __init__(self, regime, defaults: Optional[Dict[str, Any]] = None):
        if isinstance(regime, Regime):
            self.regime = regime
        else:
            self.regime = Regime(regime, defaults={"optimizer": "SGD", **(defaults or {})})
        self.regime.update(0, 0)
        self._warned: set = set()

    @property
    def optimizer_name(self) -> str:
        return str(self.regime.setting.get("optimizer", "SGD"))

    @property
    def needed_slots(self):
        names = {str(e.get("optimizer")) for e in self.regime.regime
                 if e.get("optimizer")}
        names.add(self.optimizer_name)
        slots = set()
        for n in names:
            if n in OPTIMIZERS:
                slots.update(OPTIMIZERS[n]["slots"])
        return slots or {"mu"}

    @property
    def uses_bounded_norm(self) -> bool:
        return any(isinstance(e.get("regularizer"), dict)
                   and e["regularizer"].get("name") == "BoundedWeightNorm"
                   for e in self.regime.regime)

    def init_state(self, params):
        slots = self.needed_slots
        state = init_opt_state(params,
                               with_adam=bool({"m", "v"} & slots),
                               with_momentum="mu" in slots)
        if self.uses_bounded_norm:
            from convnet_tpu.regimes.regularization import init_norms
            state["norms"] = init_norms(params)
        return state

    def update(self, epoch: float, train_steps: int) -> bool:
        """Returns True on *structural* change (optimizer class switch)."""
        before = self.optimizer_name
        self.regime.update(epoch, train_steps)
        return self.optimizer_name != before

    def hyperparams(self) -> Dict[str, float]:
        setting = self.regime.resolved()
        hp = dict(HP_DEFAULTS)
        for k in hp:
            if k in setting:
                hp[k] = float(setting[k])
        # reference spelling: regularizer spec {'name': 'WeightDecay', 'value': v}
        reg = setting.get("regularizer")
        if isinstance(reg, dict) and reg.get("name") == "WeightDecay":
            hp["decoupled_weight_decay"] = float(reg.get("value", 0.0))
        elif isinstance(reg, dict) and reg.get("name") == "L2Regularization":
            hp["weight_decay"] = float(reg.get("value", 0.0))
        elif isinstance(reg, dict) and reg.get("name") == "BoundedWeightNorm":
            hp["bounded_norm"] = 1.0
        return hp

    def state_dict(self):
        return {"epoch": self.regime.epoch, "steps": self.regime.steps}

    def load_state_dict(self, sd):
        # regimes are stateless-from-time (SURVEY.md §5.4) — replaying
        # update() at the restored (epoch, step) reproduces the setting.
        self.regime.update(sd.get("epoch", 0), sd.get("steps", 0))
