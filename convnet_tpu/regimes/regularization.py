"""Plugin regularizers driven by regime specs.

Rebuild of utils/regularization.py:~10–260 (approx., SURVEY.md §2.2):
the reference's ``Regularizer`` plugins hook ``pre_step``/``post_step``
around ``optimizer.step()`` on filtered parameter sets. Functionally:

- ``WeightDecay`` (decoupled) and ``L2Regularization`` (coupled) are
  *scalar* hyperparameters — they stream into the jitted update as
  ``hp['decoupled_weight_decay']`` / ``hp['weight_decay']``
  (regimes/optim.py) and respect the weight-decay mask (no biases, no
  BN affine — utils/param_filter.py).

- ``BoundedWeightNorm`` (the "Norm matters" variant) is *structural*:
  after each update, every filtered weight tensor is rescaled to the
  norm it had at initialization, removing the norm degree of freedom
  that WD otherwise controls. Its reference norms live in the
  optimizer state (checkpointed with it).

Specs are the reference's shape: ``{'name': 'BoundedWeightNorm',
'filter': ...}`` inside a regime entry's ``'regularizer'`` key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from convnet_tpu.utils.param_filter import wd_mask


def _norm(x):
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32))))


def init_norms(params, mask=None):
    """Per-leaf initial norms for BoundedWeightNorm (masked leaves only;
    unmasked leaves carry 0 and are left untouched)."""
    mask = mask if mask is not None else wd_mask(params)
    return jax.tree_util.tree_map(
        lambda p, m: _norm(p) if m else jnp.float32(0.0), params, mask)


def bounded_weight_norm(params, norms, mask=None):
    """Rescale each masked leaf back to its stored norm (post_step)."""
    mask = mask if mask is not None else wd_mask(params)

    def renorm(p, n, m):
        if not m:
            return p
        cur = _norm(p)
        scale = jnp.where(cur > 0, n / jnp.maximum(cur, 1e-12), 1.0)
        return (p.astype(jnp.float32) * scale).astype(p.dtype)

    return jax.tree_util.tree_map(renorm, params, norms, mask)


def spec_kind(spec) -> Optional[str]:
    """Classify a regime 'regularizer' spec."""
    if isinstance(spec, dict):
        return spec.get("name")
    return None
