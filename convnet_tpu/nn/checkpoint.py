"""Gradient (activation) checkpointing wrapper.

TPU-native equivalent of models/modules/checkpoint.py:~1–40 (approx.)
which wraps submodules in ``torch.utils.checkpoint``. Here we use
``jax.checkpoint`` (rematerialization): the wrapped child's forward is
recomputed during the backward pass, trading FLOPs for HBM
(SURVEY.md §2.1 "Gradient checkpointing").
"""

from __future__ import annotations

import jax

from convnet_tpu.core.module import Module, Context


class CheckpointModule(Module):
    def __init__(self, module: Module, policy=None):
        self.module = module
        self._remat_policy = policy  # e.g. jax.checkpoint_policies.nothing_saveable

    def __call__(self, params, state, x, ctx: Context):
        p, s = self.sub(params, state, "module")

        def fn(p, s, x):
            return self.module(p, s, x, ctx)

        remat = jax.checkpoint(fn, policy=self._remat_policy)
        y, new_s = remat(p, s, x)
        return y, ({"module": new_s} if new_s else state)
