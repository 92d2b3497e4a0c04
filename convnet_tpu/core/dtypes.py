"""Dtype policy for mixed-precision training on TPU.

The reference framework exposes ``--dtype half`` + ``--loss-scale``
(main.py / train.py, see SURVEY.md §2.3 "Mixed precision"). On TPU the
native low-precision format is bfloat16, which shares float32's exponent
range, so no loss scaling is required; we keep an optional static loss
scale for fp16 parity experiments.

Policy:
- ``param_dtype``   — dtype parameters are stored in (fp32 by default).
- ``compute_dtype`` — dtype activations/matmuls run in (bf16 on TPU).
- ``stat_dtype``    — dtype for BatchNorm running statistics and other
                      accumulators (always fp32 by default).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    stat_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)

    def cast_to_stat(self, x):
        return jnp.asarray(x, self.stat_dtype)


DEFAULT_POLICY = Policy()
# TPU-native mixed precision: fp32 master params, bf16 compute, fp32 stats.
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)

_NAMED = {
    "float32": DEFAULT_POLICY,
    "fp32": DEFAULT_POLICY,
    "bfloat16": BF16_POLICY,
    "bf16": BF16_POLICY,
    "half": BF16_POLICY,  # reference's `--dtype half` maps to bf16 on TPU
    "float16": Policy(compute_dtype=jnp.float16),
    "fp16": Policy(compute_dtype=jnp.float16),
}


def get_policy(name) -> Policy:
    """Resolve a policy by name (mirrors utils/misc.py torch_dtypes map)."""
    if isinstance(name, Policy):
        return name
    try:
        return _NAMED[str(name)]
    except KeyError:
        raise ValueError(
            f"unknown dtype policy {name!r}; choose from {sorted(_NAMED)}"
        ) from None
