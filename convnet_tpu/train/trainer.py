"""Trainer — compiled training/eval engine.

Rebuild of train.py:~20–400 (approx., SURVEY.md §2.2 "Training
engine"), redesigned for XLA's compilation model: instead of the
reference's eager per-batch loop (forward → backward per chunk →
optimizer step, with DDP all-reduce hooks), the whole step —
mixup/cutmix, micro-batched forward+backward with gradient
accumulation, gradient all-reduce, clipping, optimizer update, metric
computation — is ONE jitted function with donated buffers. Data
parallelism wraps the same function in ``shard_map`` over a
``Mesh(('data',))``; hyperparameters enter as device scalars resolved
per step by ``OptimRegime`` (regimes/optim.py) so schedules never
recompile.

Feature parity ledger vs the reference Trainer:
- chunked micro-batching (``--chunk-batch``)        → unrolled loop in-jit
- mixup/cutmix with soft-target CE                  → train/mixup.py in-jit
- label smoothing (``--label-smoothing``)            → losses.cross_entropy
- loss scale (``--loss-scale``)                      → hp['loss_scale']
- grad clip (``--grad-clip``)                        → hp['grad_clip']
- duplicates / batch augmentation (``--duplicates``) → data pipeline +
  eval-time output averaging (``average_output``) + ``--adapt-grad-norm``
- DDP/DataParallel                                   → shard_map over mesh
- per-replica BN (+ new: cross-replica via sync_bn)  → ops/norm.py
- ``calibrate_bn``                                   → Trainer.calibrate_bn
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax>=0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

from jax.sharding import PartitionSpec as P

from convnet_tpu.core.dtypes import get_policy
from convnet_tpu.core.module import Context
from convnet_tpu.regimes.optim import (
    OptimRegime, make_update_fn, clip_by_global_norm, global_norm,
)
from convnet_tpu.train.losses import CrossEntropyLoss
from convnet_tpu.train.mixup import mixup_batch, cutmix_batch
from convnet_tpu.train.meters import AverageMeter, AccuracyMeter, correct_topk

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    dtype: str = "float32"          # dtype policy name (bf16 for TPU mixed)
    impl: str = "xla"               # kernel impl: 'xla' | 'pallas'
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    label_smoothing: float = 0.0
    grad_clip: float = -1.0
    loss_scale: float = 1.0
    chunk_batch: int = 1            # micro-batches per step (grad accum)
    duplicates: int = 1             # batch augmentation factor
    adapt_grad_norm: Optional[int] = None
    sync_bn: bool = False           # cross-replica BN statistics
    shard_opt_state: bool = False   # ZeRO-1: shard moments over 'data'
    average_output: bool = False    # duplicate-averaged eval (TTA)
    model_ema: float = 0.0          # EMA decay for averaged weights (0=off)
    allreduce_dtype: Optional[str] = None  # cast grads for the all-reduce
    flat_optim: bool = False        # flattened optimizer update (opt-in:
                                    # model-level neutral-to-negative, job 122)
    print_freq: int = 50


class Trainer:
    def __init__(self, model, optim_regime: OptimRegime, num_classes: int,
                 config: TrainerConfig = None, mesh=None, seed: int = 0):
        self.model = model
        self.optim = optim_regime
        self.num_classes = num_classes
        self.cfg = config or TrainerConfig()
        self.mesh = mesh
        self.policy = get_policy(self.cfg.dtype)
        if self.cfg.shard_opt_state:
            if mesh is None:
                self.cfg = dataclasses.replace(self.cfg,
                                               shard_opt_state=False)
            elif (self.cfg.adapt_grad_norm or self.cfg.model_ema > 0
                  or "spatial" in (mesh.axis_names if mesh else ())):
                raise ValueError("shard_opt_state is incompatible with "
                                 "adapt_grad_norm, model_ema and spatial "
                                 "partitioning")
        self.rng = jax.random.PRNGKey(seed)
        self.epoch = 0
        self.training_steps = 0
        self._step_fns: Dict[str, Any] = {}
        self._eval_fn = None
        self._watcher = None

    def set_watcher(self, path_or_file):
        """Live telemetry stream (the reference's ``--tensorwatch`` /
        ``Trainer.set_watcher`` equivalent — SURVEY.md §5.1): appends
        one JSON line per training step with loss/grad-norm/lr/timing.
        Pass None to disable."""
        if path_or_file is None:
            if self._watcher is not None:
                self._watcher.close()
            self._watcher = None
        elif hasattr(path_or_file, "write"):
            self._watcher = path_or_file
        else:
            self._watcher = open(path_or_file, "a")

    # ------------------------------------------------------------------
    # step construction
    # ------------------------------------------------------------------

    @property
    def data_axis(self):
        if self.mesh is None:
            return None
        return ("data" if "data" in self.mesh.axis_names
                else self.mesh.axis_names[0])

    @property
    def spatial_axis(self):
        if self.mesh is None:
            return None
        return "spatial" if "spatial" in self.mesh.axis_names else None

    def _loss_fn(self, params, state, x, y, rng, axis_name):
        ctx = Context(train=True, rng=rng, policy=self.policy,
                      axis_name=axis_name if self.cfg.sync_bn else None,
                      spatial_axis=self.spatial_axis,
                      impl=self.cfg.impl, aux=[])
        logits, new_state = self.model(params, state, x, ctx)
        criterion = CrossEntropyLoss(smooth_eps=self.cfg.label_smoothing)
        loss = criterion(logits, y)
        # auxiliary classifier heads (GoogLeNet/Inception-v3) append
        # (weight, aux_logits) to ctx.aux during the training forward;
        # the deep-supervision losses add in here (reference
        # models/googlenet.py aux branches). Metrics use main logits.
        for aux_weight, aux_logits in ctx.aux:
            loss = loss + aux_weight * criterion(aux_logits, y)
        return loss, (new_state, logits)

    def _make_train_step(self, optimizer_name: str):
        cfg = self.cfg
        axis = self.data_axis
        update_fn = self._update_fn
        flat_optim = getattr(self, "_flat_optim", False)

        def step(params, state, opt_state, x, y, hp, rng):
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            x = self.policy.cast_to_compute(x)

            # Loss scaling (reference train.py:~(_step) multiplies the
            # loss by --loss-scale before backward): differentiate the
            # SCALED loss so small bf16/fp16 gradients don't flush to
            # zero, keep the unscaled loss in aux for metrics, and
            # unscale the gradients right after (below).
            loss_scale = hp["loss_scale"]

            def scaled_loss_fn(params, state, x, y, rng, axis_name):
                loss, (new_state, logits) = self._loss_fn(
                    params, state, x, y, rng, axis_name)
                return loss * loss_scale, (new_state, logits, loss)

            # --- mixup / cutmix (on device, soft targets) -------------
            if cfg.mixup_alpha > 0 or cfg.cutmix_alpha > 0:
                rng, k = jax.random.split(rng)
                if cfg.mixup_alpha > 0:
                    x, y = mixup_batch(k, x, y, self.num_classes,
                                       cfg.mixup_alpha)
                else:
                    x, y = cutmix_batch(k, x, y, self.num_classes,
                                        cfg.cutmix_alpha)

            # --- micro-batched forward/backward with grad accum -------
            chunks = cfg.chunk_batch
            b = x.shape[0]
            grad_fn = jax.value_and_grad(scaled_loss_fn, has_aux=True)
            if chunks > 1:
                xc = x.reshape(chunks, b // chunks, *x.shape[1:])
                yc = y.reshape(chunks, b // chunks, *y.shape[1:])

                def chunk_step(carry, inputs):
                    state, rng, gacc, lacc, c1a, c5a = carry
                    xi, yi = inputs
                    rng, k = jax.random.split(rng)
                    (_, (state, logits, loss)), g = grad_fn(
                        params, state, xi, yi, k, axis)
                    gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
                    cc1, cc5 = correct_topk(logits, yi, (1, 5))
                    return (state, rng, gacc, lacc + loss, c1a + cc1,
                            c5a + cc5), None

                # lax.scan: one traced chunk body regardless of chunk
                # count (flat compile time); gradients accumulate in the
                # carry (flat memory); BN state threads sequentially
                # through chunks like the reference's per-chunk loop
                gzero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (state, rng, grads, loss, c1, c5), _ = jax.lax.scan(
                    chunk_step,
                    (state, rng, gzero, jnp.float32(0), jnp.float32(0),
                     jnp.float32(0)),
                    (xc, yc))
                grads = jax.tree_util.tree_map(
                    lambda g_: g_ / chunks, grads)
                loss = loss / chunks
            else:
                rng, k = jax.random.split(rng)
                (_, (state, logits, loss)), grads = grad_fn(
                    params, state, x, y, k, axis)
                c1, c5 = correct_topk(logits, y, (1, 5))

            # --- loss-scale unwind, all-reduce, clip ------------------
            grads = jax.tree_util.tree_map(
                lambda g: g / loss_scale, grads)
            if cfg.shard_opt_state:
                # ZeRO-1: reduce-scatter the mean gradient, update this
                # shard's slice, all-gather updated params
                from jax.flatten_util import ravel_pytree
                from convnet_tpu.parallel import zero
                from convnet_tpu.regimes.optim import OPTIMIZERS
                state = jax.lax.pmean(state, axis)
                loss = jax.lax.pmean(loss, axis)
                c1 = jax.lax.psum(c1, axis)
                c5 = jax.lax.psum(c5, axis)
                g_slice = zero.reduce_scatter_mean(
                    grads, self._zero_padded, axis)
                gnorm = jnp.sqrt(jax.lax.psum(
                    jnp.sum(jnp.square(g_slice)), axis))
                clip_scale = jnp.where(
                    (hp["grad_clip"] > 0) & (gnorm > hp["grad_clip"]),
                    hp["grad_clip"] / jnp.maximum(gnorm, 1e-12), 1.0)
                g_slice = g_slice * clip_scale
                flat_p, unravel = ravel_pytree(params)
                flat_p = jnp.pad(
                    flat_p, (0, self._zero_padded - flat_p.shape[0]))
                p_slice = zero.shard_slice(flat_p, axis)
                mask_slice = zero.shard_slice(
                    jnp.asarray(self._zero_mask), axis)
                opt_name = self.optim.optimizer_name
                if opt_name in ("LARS", "LAMB"):
                    # layer-wise optimizers need per-LEAF norms, which a
                    # flat shard cannot see — segment-reduced variants
                    # (parallel/zero.py) recover them with one tiny psum
                    leaves = jax.tree_util.tree_leaves(params)
                    w_sq = jnp.stack([jnp.sum(jnp.square(
                        l.astype(jnp.float32))) for l in leaves])
                    seg_slice = zero.shard_slice(
                        jnp.asarray(self._zero_seg), axis)
                    if opt_name == "LARS":
                        p_slice, opt_state = zero.lars_step_sharded(
                            p_slice, g_slice, opt_state, hp,
                            mask01=mask_slice, seg_slice=seg_slice,
                            w_sq=w_sq, n_leaves=self._zero_nleaves,
                            axis_name=axis)
                    else:
                        p_slice, opt_state = zero.lamb_step_sharded(
                            p_slice, g_slice, opt_state, hp,
                            mask01=mask_slice, seg_slice=seg_slice,
                            w_sq=w_sq,
                            leaf_mask=jnp.asarray(self._zero_leafmask),
                            n_leaves=self._zero_nleaves, axis_name=axis)
                else:
                    spec = OPTIMIZERS[opt_name]
                    p_slice, opt_state = spec["step"](
                        p_slice, g_slice, opt_state, hp,
                        mask01=mask_slice, **spec["kwargs"])
                params = zero.gather_params(
                    p_slice, unravel, self._zero_size, axis)
                metrics = {"loss": loss, "correct1": c1, "correct5": c5,
                           "grad_norm": gnorm}
                return params, state, opt_state, metrics
            if self.spatial_axis is not None:
                # trunk grads are shard-partial over the spatial axis
                # (psum); replicated-head grads pass through
                from convnet_tpu.parallel.spatial import spatial_grad_reduce
                grads = spatial_grad_reduce(grads, self.spatial_axis)
            if axis is not None:
                if cfg.allreduce_dtype:
                    # low-precision gradient all-reduce (NCCL-compression
                    # analog): halves ICI/DCN bytes; each grad is already
                    # an average of many per-sample terms, so one rounding
                    # before the mean is benign — opt-in (--allreduce-dtype)
                    ar_dt = jnp.dtype(
                        {"bf16": jnp.bfloat16, "half": jnp.bfloat16,
                         "fp16": jnp.float16}.get(cfg.allreduce_dtype,
                                                  cfg.allreduce_dtype))
                    grads = jax.tree_util.tree_map(
                        lambda g: jax.lax.pmean(
                            g.astype(ar_dt), axis).astype(g.dtype), grads)
                else:
                    grads = jax.lax.pmean(grads, axis)
                # running BN stats averaged across replicas (per-replica
                # normalization is preserved — "ghost batch norm")
                state = jax.lax.pmean(state, axis)
                loss = jax.lax.pmean(loss, axis)
                c1 = jax.lax.psum(c1, axis)
                c5 = jax.lax.psum(c5, axis)

            # --- adaptive grad-norm for batch augmentation ------------
            if cfg.adapt_grad_norm and cfg.duplicates > 1:
                # "Augment your batch" (CVPR'20): rescale the aggregated
                # gradient to the norm a single duplicate would produce.
                # The ratio is re-measured every `adapt_grad_norm` steps
                # (extra backward on one duplicate) and cached in the
                # optimizer state between measurements. The loaders pack
                # duplicates contiguously per sample (np.repeat), so the
                # single-copy-per-sample reference batch is the STRIDED
                # slice x[::d] — x[:b//d] would still be
                # duplicate-contaminated (b/d² samples × d copies each).
                rng, k = jax.random.split(rng)
                cur_norm = global_norm(grads)

                def measure(_):
                    (_, _), sub_grads = grad_fn(
                        params, state, x[::cfg.duplicates],
                        y[::cfg.duplicates], k, axis)
                    sub_grads = jax.tree_util.tree_map(
                        lambda g: g / loss_scale, sub_grads)
                    # reduce like the main gradient path so every
                    # replica measures the same target norm (otherwise
                    # per-replica scales desynchronize the params)
                    if self.spatial_axis is not None:
                        from convnet_tpu.parallel.spatial import (
                            spatial_grad_reduce)
                        sub_grads = spatial_grad_reduce(
                            sub_grads, self.spatial_axis)
                    if axis is not None:
                        sub_grads = jax.lax.pmean(sub_grads, axis)
                    target = global_norm(sub_grads)
                    return target / jnp.maximum(cur_norm, 1e-12)

                recompute = (opt_state["step"] % cfg.adapt_grad_norm) == 0
                scale = jax.lax.cond(
                    recompute, measure,
                    lambda _: opt_state["agn_scale"], operand=None)
                opt_state = {**opt_state, "agn_scale": scale}
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

            if flat_optim:
                # Flat update (jobs 120/121): one ravel, one fused
                # vector update, one unravel — instead of 3×n_leaves
                # tiny per-leaf fusions. Clip rides the flat vector too
                # (the global norm is the same sum, one reduction).
                from jax.flatten_util import ravel_pytree
                flat_g, _ = ravel_pytree(jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads))
                flat_p, unravel = ravel_pytree(params)
                fdt = flat_p.dtype
                # same helper as the tree path — the flat vector is
                # just a one-leaf pytree, global norm is the same sum
                flat_g, gnorm = clip_by_global_norm(flat_g,
                                                    hp["grad_clip"])
                flat_p, opt_state = update_fn(flat_p, flat_g,
                                              opt_state, hp)
                if cfg.model_ema > 0:
                    d = cfg.model_ema
                    opt_state = {**opt_state,
                                 "ema": opt_state["ema"] * d
                                 + flat_p.astype(jnp.float32) * (1.0 - d)}
                params = unravel(flat_p.astype(fdt))
            else:
                grads, gnorm = clip_by_global_norm(grads, hp["grad_clip"])
                params, opt_state = update_fn(params, grads, opt_state, hp)
                if cfg.model_ema > 0:
                    # Polyak/EMA weight averaging (production serving
                    # staple; beyond the reference). Evaluated/served via
                    # Trainer.ema_params(opt_state).
                    d = cfg.model_ema
                    opt_state = {**opt_state, "ema": jax.tree_util.tree_map(
                        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        opt_state["ema"], params)}
            metrics = {"loss": loss, "correct1": c1, "correct5": c5,
                       "grad_norm": gnorm}
            return params, state, opt_state, metrics

        if self.mesh is not None:
            x_spec = (P(axis, self.spatial_axis) if self.spatial_axis
                      else P(axis))
            opt_spec = (self._opt_specs if cfg.shard_opt_state else P())
            step = _shard_map_fn(
                step, mesh=self.mesh,
                in_specs=(P(), P(), opt_spec, x_spec, P(axis), P(), P()),
                out_specs=(P(), P(), opt_spec, P()),
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _make_eval_step(self):
        cfg = self.cfg
        axis = self.data_axis

        def step(params, state, x, y):
            x = self.policy.cast_to_compute(x)
            ctx = Context(train=False, policy=self.policy, impl=cfg.impl,
                          spatial_axis=self.spatial_axis)
            logits, _ = self.model(params, state, x, ctx)
            n = x.shape[0]
            if cfg.duplicates > 1 and cfg.average_output:
                d = cfg.duplicates
                logits = logits.astype(jnp.float32)
                logits = logits.reshape(n // d, d, -1).mean(axis=1)
                y = y.reshape(n // d, d)[:, 0]
                n = n // d
            criterion = CrossEntropyLoss(smooth_eps=0.0, reduction="sum")
            loss_sum = criterion(logits, y)  # ignore_index=-100 masks padding
            c1, c5 = correct_topk(logits, y, (1, 5))  # -100 never matches
            count = jnp.sum((y >= 0).astype(jnp.float32))
            if axis is not None:
                # sum-reduce then normalize globally: shards may carry
                # unequal numbers of valid (non-padding) samples
                loss_sum = jax.lax.psum(loss_sum, axis)
                c1 = jax.lax.psum(c1, axis)
                c5 = jax.lax.psum(c5, axis)
                count = jax.lax.psum(count, axis)
            loss = loss_sum / jnp.maximum(count, 1.0)
            return {"loss": loss, "correct1": c1, "correct5": c5,
                    "count": count}

        if self.mesh is not None:
            x_spec = (P(axis, self.spatial_axis) if self.spatial_axis
                      else P(axis))
            step = _shard_map_fn(
                step, mesh=self.mesh,
                in_specs=(P(), P(), x_spec, P(axis)),
                out_specs=P(),
                check_vma=False,
            )
        return jax.jit(step)

    def _get_train_step(self):
        name = self.optim.optimizer_name
        if name not in self._step_fns:
            if getattr(self, "_flat_optim", False):
                from convnet_tpu.regimes.optim import make_flat_update_fn
                self._update_fn = make_flat_update_fn(
                    name, self._params_template, self._wd_mask)
            else:
                self._update_fn = make_update_fn(
                    name, self._params_template, self._wd_mask,
                    bounded_norm=self.optim.uses_bounded_norm)
            self._step_fns[name] = self._make_train_step(name)
        return self._step_fns[name]

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def initialize(self, params, state, wd_mask_tree=None):
        """Register model arrays; returns optimizer state."""
        self._params_template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
        from convnet_tpu.utils.param_filter import wd_mask as default_mask
        self._wd_mask = (wd_mask_tree if wd_mask_tree is not None
                         else default_mask(params))
        if self.cfg.shard_opt_state:
            # ZeRO-1 already keeps optimizer state as flat shards
            self._flat_optim = False
            if self.cfg.flat_optim:
                logging.warning("--flat-optim ignored: shard_opt_state "
                                "(ZeRO-1) is already a flat-shard path")
            if self.optim.uses_bounded_norm:
                raise ValueError("shard_opt_state is incompatible with "
                                 "BoundedWeightNorm")
            # ZeRO-1 (parallel/zero.py): moments live as flat padded
            # vectors sharded over 'data'; params stay replicated
            from jax.sharding import NamedSharding
            from convnet_tpu.parallel import zero
            from convnet_tpu.parallel.mesh import replicate
            n = self.mesh.shape[self.data_axis]
            padded = zero.flat_size(params, n)
            self._zero_padded = padded
            self._zero_size = sum(int(x.size) for x in
                                  jax.tree_util.tree_leaves(params))
            self._zero_mask = zero.flat_mask01(params, self._wd_mask, n)
            self._zero_seg = zero.leaf_segment_ids(params, n)
            self._zero_leafmask = zero.leaf_mask01(params, self._wd_mask)
            self._zero_nleaves = len(jax.tree_util.tree_leaves(params))
            flat_template = jnp.zeros((padded,), jnp.float32)
            opt_state = self.optim.init_state(flat_template)
            self._opt_specs = jax.tree_util.tree_map(
                lambda x: P(self.data_axis) if getattr(x, "ndim", 0) == 1
                else P(), opt_state)
            opt_state = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)),
                opt_state, self._opt_specs)
            params = replicate(params, self.mesh)
            state = replicate(state, self.mesh)
            return params, state, opt_state

        # Flattened optimizer state (OPT-IN): moments live as ONE flat
        # fp32 vector instead of a per-leaf tree. The isolated per-leaf
        # update costs 6.8× more dispatch than flat on many-leaf models
        # (Inception-v4: 17.8 → 2.6 ms, job 121), but the model-level
        # A/B measured flat neutral-to-NEGATIVE across the zoo
        # (0.967–1.017×, job 122): in the real step the tiny update
        # fusions hide under async DMA while the flat path's
        # ravel/unravel bytes are real. Kept opt-in + equivalence-
        # tested (tests/test_flat_optim.py); checkpoints adapt
        # tree↔flat on resume (adapt_opt_state).
        self._flat_optim = (self.cfg.flat_optim
                            and not self.optim.uses_bounded_norm)
        if self.cfg.flat_optim and self.optim.uses_bounded_norm:
            logging.warning("--flat-optim ignored: BoundedWeightNorm "
                            "regimes renormalize per parameter leaf")
        if self._flat_optim:
            from jax.flatten_util import ravel_pytree
            flat_p, self._unravel = ravel_pytree(params)
            opt_state = self.optim.init_state(
                jnp.zeros((flat_p.size,), jnp.float32))
        else:
            opt_state = self.optim.init_state(params)
        if self.cfg.adapt_grad_norm and self.cfg.duplicates > 1:
            opt_state["agn_scale"] = jnp.float32(1.0)
        if self.cfg.model_ema > 0:
            if self._flat_optim:
                # flat fp32 EMA vector; Trainer.ema_params unravels it
                opt_state["ema"] = flat_p.astype(jnp.float32)
            else:
                # real copies — params and opt_state are both donated,
                # so the EMA tree must not alias the param buffers
                opt_state["ema"] = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, copy=True), params)
        if self.mesh is not None:
            from convnet_tpu.parallel.mesh import replicate
            params = replicate(params, self.mesh)
            state = replicate(state, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        return params, state, opt_state

    def ema_params(self, opt_state):
        """The EMA-averaged weights (cfg.model_ema > 0), or None.
        Under the flat-optimizer path the EMA lives as a flat fp32
        vector; unravel it back to the parameter tree here."""
        ema = opt_state.get("ema") if isinstance(opt_state, dict) else None
        if ema is not None and getattr(ema, "ndim", None) == 1:
            return self._unravel(ema)
        return ema

    def _hp_device(self, hp: Dict[str, float]):
        return {k: jnp.float32(v) for k, v in hp.items()}

    def _shard(self, *arrays):
        """Place host batches on the mesh.

        Multi-host: each process's loader yields only its LOCAL slice
        of the global batch (DataRegime applies per-host sharding), so
        the global array must be assembled with
        ``make_array_from_process_local_data`` — a plain ``device_put``
        would treat every host's different local slice as the same
        global value. This mirrors parallel/mesh.py ``shard_batch``
        (the jax.Array analog of DistributedSampler + per-rank
        batches, SURVEY.md §2.4)."""
        if self.mesh is None:
            return arrays
        import numpy as _np
        from jax.sharding import NamedSharding
        multihost = jax.process_count() > 1
        if multihost and self.spatial_axis is not None:
            # Supported iff every spatial group (the devices sharing one
            # data index) lives on ONE host: the loader shards the batch
            # per host with FULL-height images, so the process's
            # addressable portion of a P(data, spatial) array is exactly
            # its local batch slice — make_array_from_process_local_data
            # assembles it directly. make_mesh_2d's row-major layout
            # gives this placement whenever spatial divides the local
            # device count (spatial neighbors are also ICI-adjacent).
            if not getattr(self, "_spatial_placement_ok", False):
                # validated once per trainer: the mesh cannot change
                axes = self.mesh.axis_names
                sp_axis_idx = axes.index(self.spatial_axis)
                devs = np.moveaxis(self.mesh.devices, sp_axis_idx, -1)
                for group in devs.reshape(-1, devs.shape[-1]):
                    procs = {d.process_index for d in group}
                    if len(procs) > 1:
                        raise NotImplementedError(
                            "spatial partitioning requires each spatial "
                            "group to be host-local (a group spans "
                            f"processes {sorted(procs)}); choose a "
                            "spatial degree that divides the per-host "
                            "device count")
                self._spatial_placement_ok = True
        out = []
        for a in arrays:
            if self.spatial_axis is not None and getattr(a, "ndim", 0) == 4:
                spec = P(self.data_axis, self.spatial_axis)
            else:
                spec = P(self.data_axis)
            sharding = NamedSharding(self.mesh, spec)
            if multihost:
                out.append(jax.make_array_from_process_local_data(
                    sharding, _np.asarray(a)))
            else:
                out.append(jax.device_put(a, sharding))
        return tuple(out)

    # ------------------------------------------------------------------
    # epoch loops (host side)
    # ------------------------------------------------------------------

    def train_epoch(self, loader, params, state, opt_state, epoch: int,
                    steps_per_epoch: Optional[int] = None,
                    start_batch: int = 0, step_hook=None):
        """One training epoch. Returns (params, state, opt_state, results).

        ``start_batch``: skip the first K batches — mid-epoch resume
        after preemption. The loader is epoch-seeded (deterministic
        batch order/augmentation per (seed, epoch)), and skipped
        batches are consumed WITHOUT advancing the trainer RNG, so a
        resume that restores ``self.rng`` from the checkpoint replays
        the uninterrupted trajectory exactly. Epoch metrics cover only
        the remaining batches.

        ``step_hook(params, state, opt_state, batch_idx)``: called
        after each step — the CLI's ``--save-freq`` periodic
        checkpointing attaches here.
        """
        self.epoch = epoch
        meters = {k: AverageMeter() for k in
                  ("loss", "grad_norm", "data_time", "step_time")}
        step_times = []
        acc = AccuracyMeter()
        pending = collections.deque()
        spe = steps_per_epoch or getattr(loader, "__len__", lambda: None)()

        samples = 0
        t_epoch0 = time.perf_counter()
        t_last = time.perf_counter()
        for i, (x, y) in enumerate(loader):
            if i < start_batch:
                t_last = time.perf_counter()
                continue
            t_data = time.perf_counter()
            frac_epoch = epoch + (i / spe if spe else 0)
            structural = self.optim.update(frac_epoch, self.training_steps)
            if structural:
                log.info("optimizer switched to %s — re-jitting",
                         self.optim.optimizer_name)
            hp = self._hp_device(self.optim.hyperparams())
            self.rng, step_rng = jax.random.split(self.rng)
            bsz = x.shape[0]
            samples += bsz
            x, y = self._shard(jnp.asarray(x), jnp.asarray(y))
            step_fn = self._get_train_step()
            params, state, opt_state, metrics = step_fn(
                params, state, opt_state, x, y, hp, step_rng)
            self.training_steps += 1
            if step_hook is not None:
                step_hook(params, state, opt_state, i + 1)
            t_step = time.perf_counter()

            pending.append((metrics, bsz, t_data - t_last, t_step - t_data))
            # lazily drain metrics to avoid blocking the device queue
            while len(pending) > 2 or (spe and i == spe - 1 and pending):
                m, n, dt, st = pending.popleft()
                meters["loss"].update(float(m["loss"]), n)
                meters["grad_norm"].update(float(m["grad_norm"]))
                meters["data_time"].update(dt)
                meters["step_time"].update(st)
                step_times.append(st)
                acc.update((float(m["correct1"]), float(m["correct5"])), n)
                if self._watcher is not None:
                    import json as _json
                    self._watcher.write(_json.dumps({
                        "epoch": epoch, "step": self.training_steps,
                        "loss": float(m["loss"]),
                        "grad_norm": float(m["grad_norm"]),
                        "lr": float(hp["lr"]), "step_time": st,
                        "data_time": dt}) + "\n")
                    self._watcher.flush()
            if self.cfg.print_freq and i % self.cfg.print_freq == 0:
                log.info(
                    "epoch %d step %d/%s loss %.4f prec1 %.2f prec5 %.2f "
                    "lr %.4g step_time %.3fs data_time %.3fs",
                    epoch, i, spe or "?", meters["loss"].avg, acc.value(1),
                    acc.value(5), float(hp["lr"]), meters["step_time"].avg,
                    meters["data_time"].avg)
            t_last = time.perf_counter()

        while pending:
            m, n, dt, st = pending.popleft()
            meters["loss"].update(float(m["loss"]), n)
            meters["grad_norm"].update(float(m["grad_norm"]))
            meters["data_time"].update(dt)
            meters["step_time"].update(st)
            step_times.append(st)
            acc.update((float(m["correct1"]), float(m["correct5"])), n)

        # wall-clock throughput is the honest number on backends with
        # fully-async dispatch (per-step meters only time the enqueue)
        epoch_wall = time.perf_counter() - t_epoch0
        results = {"loss": meters["loss"].avg, "prec1": acc.value(1),
                   "prec5": acc.value(5),
                   "step_time": meters["step_time"].avg,
                   # p50 over post-warmup steps (first step pays compile)
                   "step_time_p50": float(np.median(step_times[1:] or step_times
                                                    or [0.0])),
                   "data_time": meters["data_time"].avg,
                   "epoch_time": epoch_wall,
                   "img_per_sec": samples / max(epoch_wall, 1e-9),
                   "grad_norm": meters["grad_norm"].avg}
        return params, state, opt_state, results

    def validate(self, loader, params, state):
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_step()
        loss_m = AverageMeter()
        acc = AccuracyMeter()
        pad_to = (self.mesh.shape[self.data_axis] if self.mesh is not None
                  else 1) * max(self.cfg.duplicates, 1)
        # metrics drain lazily (lag-2 deque, same as train_epoch) so the
        # host never syncs on the batch it just enqueued — eval batches
        # stream back-to-back on the device
        pending = collections.deque()

        def drain():
            m = pending.popleft()
            n = int(float(m["count"]))
            loss_m.update(float(m["loss"]), n)
            acc.update((float(m["correct1"]), float(m["correct5"])), n)

        for x, y in loader:
            x, y = jnp.asarray(x), jnp.asarray(y)
            if x.shape[0] % pad_to:
                # remainder batch: pad; y=-100 rows are masked out of
                # loss/accuracy/count inside the eval step
                extra = pad_to - x.shape[0] % pad_to
                x = jnp.concatenate(
                    [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)])
                y = jnp.concatenate(
                    [y, jnp.full((extra,), -100, y.dtype)])
            x, y = self._shard(x, y)
            pending.append(self._eval_fn(params, state, x, y))
            while len(pending) > 2:
                drain()
        while pending:
            drain()
        return {"loss": loss_m.avg, "prec1": acc.value(1),
                "prec5": acc.value(5)}

    # ------------------------------------------------------------------
    # BN calibration (train.py:~350–390 calibrate_bn equivalent)
    # ------------------------------------------------------------------

    def calibrate_bn(self, loader, params, state, num_steps: int = 100):
        """Re-estimate BN running statistics over ``loader`` (used after
        weight averaging / absorb experiments). Recovers exact batch
        moments from the EMA update and accumulates a plain average.

        Mesh-aware (round-2 VERDICT weak #5): on a mesh the batch is
        sharded over the data axis and the moments are averaged across
        shards inside the forward (cross-replica BN, regardless of
        ``sync_bn`` — calibration wants GLOBAL batch moments, matching
        the reference's ``calibrate_bn`` under its distributed wrapper,
        train.py:~350-390 approx.), so the result equals a single
        device seeing the full batch."""
        axis = self.data_axis

        def batch_stats(params, state, x):
            ctx = Context(train=True, rng=jax.random.PRNGKey(0),
                          policy=self.policy, impl=self.cfg.impl,
                          axis_name=axis,
                          spatial_axis=self.spatial_axis)
            _, new_state = self.model(params, state, x, ctx)
            return new_state

        if self.mesh is not None:
            x_spec = (P(axis, self.spatial_axis) if self.spatial_axis
                      else P(axis))
            batch_stats = _shard_map_fn(
                batch_stats, mesh=self.mesh,
                in_specs=(P(), P(), x_spec),
                out_specs=P(),
                check_vma=False,
            )
        batch_stats = jax.jit(batch_stats)

        # each BN layer may carry its own momentum (BatchNorm2d exposes
        # the parameter) — walk the module tree parallel to the state
        # tree so recover() inverts the EMA with the right per-layer m
        # (state leaves are exclusively BN running stats; BatchNorm2d is
        # the only module whose init() returns state)
        def momentum_tree(module, st):
            from convnet_tpu.nn.layers import BatchNorm2d
            if isinstance(module, BatchNorm2d):
                return {k: module.momentum for k in st}
            kids = dict(module.children())
            return {name: momentum_tree(kids[name], sub)
                    for name, sub in st.items()}

        mom = momentum_tree(self.model, state)

        def recover(old, new):
            # new = (1-m)*old + m*batch  →  batch = (new - (1-m)*old)/m
            return jax.tree_util.tree_map(
                lambda n_, o_, m_: (n_ - (1 - m_) * o_) / m_, new, old, mom)

        avg = None
        count = 0
        for i, (x, y) in enumerate(loader):
            if i >= num_steps:
                break
            x = self.policy.cast_to_compute(jnp.asarray(x))
            if self.mesh is not None:
                (x,) = self._shard(x)
            new_state = batch_stats(params, state, x)
            batch = recover(state, new_state)
            if avg is None:
                avg = batch
            else:
                avg = jax.tree_util.tree_map(
                    lambda a, b: a + (b - a) / (count + 1), avg, batch)
            count += 1
        return avg if avg is not None else state
