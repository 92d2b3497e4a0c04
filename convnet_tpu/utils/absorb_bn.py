"""BatchNorm folding for inference.

Rebuild of utils/absorb_bn.py:~5–90 (approx., SURVEY.md §2.2): fold a
BatchNorm's affine transform + running statistics into the preceding
conv/linear weights so inference runs without the BN op. In this
functional framework the fold is a *pytree → pytree* transformation:
``absorb_bn_tree`` walks (params, state) and rewrites every
``{conv|linear, bn}`` pair produced by the ``ConvBN``-style modules
(models/resnet.py ConvBN, mobilenet, etc.).

Math: y = γ·(W*x + b − μ)/σ + β  ⇒  W' = W·γ/σ,  b' = β + γ(b − μ)/σ,
with σ = sqrt(var + eps). After folding, the BN params are set to
identity (γ=1, β=0, μ=0, σ²=1) so the same model graph computes the
same result; ``deabsorbable=False`` marks nothing — folding is
idempotent.
"""

from __future__ import annotations

import jax.numpy as jnp


def absorb_bn_pair(conv_params, bn_params, bn_state, eps=1e-5):
    """Returns (new_conv_params, new_bn_params, new_bn_state).

    The multiplicative factor γ/σ is folded into the conv weights; the
    additive shift stays in the BN slot (the module structure is static
    — a bias-less Conv2d cannot grow a bias), but the BN becomes a pure
    ``x + shift``: mean=0, var=1−eps (so 1/sqrt(var+eps)=1), scale=1,
    bias=shift. The graph is unchanged yet all per-channel normalization
    math is gone from the conv's critical path and XLA folds the
    remaining add into the conv's epilogue.
    """
    w = conv_params["w"].astype(jnp.float32)
    b = conv_params.get("b")
    b = jnp.zeros(w.shape[-1], jnp.float32) if b is None else b.astype(jnp.float32)

    mean = bn_state["mean"]
    var = bn_state["var"]
    inv_sigma = 1.0 / jnp.sqrt(var + eps)
    gamma = bn_params.get("scale")
    beta = bn_params.get("bias")
    gamma = jnp.ones_like(mean) if gamma is None else gamma.astype(jnp.float32)
    beta = jnp.zeros_like(mean) if beta is None else beta.astype(jnp.float32)

    factor = gamma * inv_sigma               # per-output-channel
    # conv w is HWIO / linear w is (in, out): last axis is out-channel
    new_w = w * factor
    shift = beta + (b - mean) * factor

    new_conv = dict(conv_params)
    new_conv["w"] = new_w.astype(conv_params["w"].dtype)
    if "b" in new_conv:
        new_conv["b"] = jnp.zeros_like(b)    # bias absorbed into shift

    new_bn_state = {"mean": jnp.zeros_like(mean),
                    "var": jnp.full_like(var, 1.0 - eps)}
    if "scale" in bn_params:
        new_bn_params = {"scale": jnp.ones_like(gamma), "bias": shift}
    else:
        # affine-less BN: encode the shift in the mean instead
        new_bn_params = {}
        new_bn_state["mean"] = -shift
    return new_conv, new_bn_params, new_bn_state


def search_absorb_bn(params, state, eps=1e-5):
    """Walk the model pytree and fold every sibling {conv, bn} or
    {<leaf layer with 'w'>, bn} pair (the ``search_absorbe_bn`` walk of
    the reference, adapted to pytrees). Returns (params, state).

    A pair is recognized when a dict has child keys ``conv``-like
    (containing a 'w' leaf) and ``bn``-like (state with 'mean'/'var')
    at the same level — which is exactly the shape ``ConvBN`` and
    friends produce.
    """

    def is_convlike(p):
        return isinstance(p, dict) and "w" in p

    def is_bnlike(name, s):
        return isinstance(s, dict) and "mean" in s and "var" in s

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else s
        names = list(p.keys())
        for i, name in enumerate(names):
            # find conv followed by a bn sibling
            if is_convlike(p[name]):
                for bn_name in names[i + 1:]:
                    if (isinstance(s, dict) and bn_name in s
                            and is_bnlike(bn_name, s[bn_name])):
                        new_conv, new_bn_p, new_bn_s = absorb_bn_pair(
                            p[name], p.get(bn_name, {}), s[bn_name], eps)
                        p[name] = new_conv
                        if new_bn_p:
                            p[bn_name] = new_bn_p
                        s[bn_name] = new_bn_s
                        break
                    if bn_name in p and is_convlike(p[bn_name]):
                        break  # another conv intervenes — no fold
        for name in names:
            if isinstance(p.get(name), dict):
                child_s = s.get(name, {}) if isinstance(s, dict) else {}
                p[name], new_child_s = walk(p[name], child_s)
                if isinstance(s, dict) and (new_child_s or name in s):
                    s[name] = new_child_s
        return p, s

    return walk(params, state)
