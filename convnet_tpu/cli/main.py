"""CLI driver — the reference's ``main.py`` surface, TPU-native inside.

Usage mirrors the reference (main.py:~30–140 approx., SURVEY.md §5.6):

    python main.py --model resnet --dataset imagenet \
        --model-config "{'depth': 50}" -b 256 --epochs 90

Flow (call stack §3.1): parse args → seeds → (multi-host init) → build
model from zoo (+ its embedded regime) → criterion/OptimRegime/Trainer →
train & eval DataRegimes → epoch loop with checkpoint/resume and
results logging.
"""

from __future__ import annotations

import argparse
import ast
import logging
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def build_parser():
    p = argparse.ArgumentParser(description="convnet_tpu training")
    # data
    p.add_argument("--dataset", default="imagenet")
    p.add_argument("--datasets-dir", default=os.environ.get(
        "CONVNET_TPU_DATA", os.path.expanduser("~/datasets")))
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--autoaugment", action="store_true")
    p.add_argument("--no-augment", action="store_true",
                   help="disable training-time augmentation")
    p.add_argument("--cutout", action="store_true")
    p.add_argument("--duplicates", type=int, default=1,
                   help="batch augmentation: times each sample appears")
    p.add_argument("--multicrop", action="store_true",
                   help="deterministic multi-crop TTA at eval "
                        "(use with --duplicates 5 or 10)")
    # model
    p.add_argument("--model", default=None,
                   help="model factory name (default resnet; with "
                        "--resume/--evaluate and no explicit --model, "
                        "restored from the checkpoint's recorded "
                        "model + config)")
    p.add_argument("--model-config", default="",
                   help="python-literal dict merged into model factory kwargs")
    # training
    p.add_argument("-b", "--batch-size", type=int, default=256)
    p.add_argument("--eval-batch-size", type=int, default=-1)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--optimizer", default=None,
                   help="override the model regime's optimizer in EVERY "
                        "phase (the embedded schedule never reverts it)")
    p.add_argument("--lr", type=float, default=None,
                   help="rescale the model regime's WHOLE lr schedule "
                        "multiplicatively so the base (epoch-0) lr "
                        "becomes this value — decay structure (step "
                        "drops, warmup, cosine) is preserved")
    p.add_argument("--momentum", type=float, default=None,
                   help="override the model regime's momentum in EVERY "
                        "phase")
    p.add_argument("--weight-decay", type=float, default=None,
                   help="override the model regime's (decoupled) weight "
                        "decay value in EVERY phase")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--mixup", type=float, default=0.0, help="mixup alpha")
    p.add_argument("--cutmix", type=float, default=0.0, help="cutmix alpha")
    p.add_argument("--chunk-batch", type=int, default=1,
                   help="micro-batches per step (gradient accumulation)")
    p.add_argument("--grad-clip", type=float, default=-1.0)
    p.add_argument("--adapt-grad-norm", type=int, default=None)
    p.add_argument("--dtype", default="float32",
                   help="compute dtype policy: float32|bf16|half")
    p.add_argument("--loss-scale", type=float, default=1.0)
    p.add_argument("--model-ema", type=float, default=0.0,
                   help="EMA decay for averaged weights (e.g. 0.999); "
                        "validation/checkpointing use the EMA copy")
    p.add_argument("--seed", type=int, default=123)
    # parallelism
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel degree (default: all local devices)")
    p.add_argument("--sync-bn", action="store_true",
                   help="cross-replica BatchNorm statistics over ICI")
    p.add_argument("--shard-opt-state", action="store_true",
                   help="ZeRO-1: shard optimizer moments over the data "
                        "axis (reduce-scatter grads, all-gather params)")
    p.add_argument("--spatial", type=int, default=1,
                   help="spatial-partitioning degree: shard activation "
                        "height over this many devices (2-D mesh)")
    p.add_argument("--allreduce-dtype", default=None,
                   choices=["bf16", "fp16"],
                   help="cast gradients for the all-reduce (halves "
                        "ICI/DCN bytes; grads are re-cast after)")
    p.add_argument("--flat-optim", action="store_true",
                   help="flattened optimizer update: one fused vector "
                        "op instead of per-leaf fusions (measured "
                        "neutral-to-negative model-level on one chip — "
                        "scripts/jobs 120-122; opt-in)")
    p.add_argument("--dist-init", default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--dist-rank", type=int, default=0)
    p.add_argument("--dist-world-size", type=int, default=1)
    p.add_argument("--impl", default="xla", choices=["xla", "pallas"],
                   help="hot-path kernel implementation")
    # bookkeeping
    p.add_argument("--results-dir", default="./results")
    p.add_argument("--save", default="",
                   help="experiment save name (default: timestamp)")
    p.add_argument("--resume", default="", help="checkpoint path to resume")
    p.add_argument("--evaluate", default="",
                   help="evaluate checkpoint path and exit")
    p.add_argument("--import-torch", default="", metavar="PATH",
                   help="initialize weights from a PyTorch reference "
                        "checkpoint (.pth/.pth.tar state_dict; layouts "
                        "converted automatically)")
    p.add_argument("--calibrate-bn", action="store_true")
    p.add_argument("--absorb-bn", action="store_true",
                   help="fold BN into convs before evaluation")
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--save-all", action="store_true")
    p.add_argument("--save-freq", type=int, default=0, metavar="N",
                   help="also checkpoint every N training steps "
                        "(preemption recovery on TPU pods; resume "
                        "continues mid-epoch, bit-exact)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of epoch 0")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax nan-checking (debug runs)")
    p.add_argument("--tensorwatch", action="store_true",
                   help="stream per-step telemetry to results/<save>/watch.jsonl")
    p.add_argument("--compile-cache", default=os.environ.get(
                       "CONVNET_TPU_COMPILE_CACHE", ""), metavar="DIR",
                   help="persistent XLA compilation cache directory — "
                        "relaunches/resumes skip recompiling the train "
                        "step (env: CONVNET_TPU_COMPILE_CACHE)")
    return p


def main(argv=None):
    from convnet_tpu import models
    from convnet_tpu.core.module import param_count
    from convnet_tpu.data.data_regime import DataRegime
    from convnet_tpu.parallel.mesh import make_mesh
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.regimes.regime import (rescale_regime_lr,
                                            replace_regime_key)
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    from convnet_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint, peek_checkpoint_meta,
        tree_dtype_cast_like, tree_place_like, adapt_opt_state)
    from convnet_tpu.utils.log import (
        setup_logging, ResultsLog, export_args_namespace)
    from convnet_tpu.utils.misc import set_global_seeds

    args = build_parser().parse_args(argv)

    save_name = args.save or datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    save_path = os.path.join(args.results_dir, save_name)
    os.makedirs(save_path, exist_ok=True)
    setup_logging(os.path.join(save_path, "log.txt"), resume=bool(args.resume))
    export_args_namespace(args, os.path.join(save_path, "args.json"))
    log.info("saving to %s", save_path)

    if args.dist_init:
        coordinator = args.dist_init.replace("tcp://", "")
        jax.distributed.initialize(coordinator, args.dist_world_size,
                                   args.dist_rank)
        log.info("multi-host: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.compile_cache:
        from convnet_tpu.utils.misc import enable_compile_cache
        enable_compile_cache(args.compile_cache)
        log.info("persistent compilation cache: %s", args.compile_cache)
    set_global_seeds(args.seed)

    # ---- model (embedded regime) ------------------------------------
    model_config = ast.literal_eval(args.model_config) if args.model_config else {}
    if args.resume or args.evaluate:
        # framework checkpoints are self-describing: adopt the recorded
        # model + config unless the user explicitly overrode them
        # (reference resume rebuilds from args only; this removes the
        # re-specify-your-flags failure mode)
        try:
            meta = peek_checkpoint_meta(args.resume or args.evaluate)
        except Exception:
            meta = {}  # torch / missing file — surfaced at load time
        if args.input_size is None and meta.get("input_size"):
            # geometry is part of the checkpoint's identity too: evaluate
            # at (and resume recording) the size the run was trained at,
            # matching Predictor.from_checkpoint — not the dataset default
            args.input_size = int(meta["input_size"])
            log.info("input size restored from checkpoint: %d",
                     args.input_size)
        if meta.get("model"):
            if args.model is None:
                args.model = meta["model"]
                merged = dict(meta.get("config") or {})
                merged.update(model_config)  # explicit entries win
                model_config = merged
                log.info("model restored from checkpoint: %s %s",
                         args.model, model_config)
            elif args.model == meta["model"]:
                # same model named explicitly: a run trained with a
                # custom config (width/depth overrides) must restore —
                # merge the recorded config underneath any explicit
                # entries, same precedence as the model-omitted path
                merged = dict(meta.get("config") or {})
                merged.update(model_config)
                model_config = merged
            else:
                log.warning("--model %s != checkpoint's recorded model "
                            "%s — the load will fail unless the "
                            "architectures match", args.model,
                            meta["model"])
    args.model = args.model or "resnet"
    model_config.setdefault("dataset", args.dataset)
    if args.dataset.startswith("synthetic") and "dataset" in model_config:
        model_config["dataset"] = ("cifar10" if "imagenet" not in args.dataset
                                   else "imagenet")
    model = models.build(args.model, **model_config)
    log.info("created model %s (%s), config %s", args.model,
             type(model).__name__, model_config)

    regime = list(getattr(model, "regime", [{"epoch": 0, "optimizer": "SGD",
                                             "lr": 0.1, "momentum": 0.9}]))
    if args.lr is not None:
        regime = rescale_regime_lr(regime, args.lr)
    flat = {}
    if args.optimizer:
        flat["optimizer"] = args.optimizer
    if args.momentum is not None:
        flat["momentum"] = args.momentum
    if args.weight_decay is not None:
        flat["regularizer"] = {"name": "WeightDecay",
                               "value": args.weight_decay}
    for key, value in flat.items():
        regime = replace_regime_key(regime, key, value)
    optim = OptimRegime(regime)

    num_classes = {"cifar10": 10, "cifar100": 100, "mnist": 10,
                   "imagenet": 1000}.get(args.dataset, None)
    if num_classes is None:
        num_classes = model_config.get("num_classes", 10 if "imagenet" not in
                                       args.dataset else 1000)

    # ---- mesh / trainer ---------------------------------------------
    devices = jax.devices()
    n_dev = args.num_devices or len(devices)
    if args.spatial > 1:
        from convnet_tpu.parallel.mesh import make_mesh_2d
        mesh = make_mesh_2d(args.spatial, n_dev)
    else:
        mesh = make_mesh(n_dev) if n_dev > 1 else None
    log.info("devices: %d (%s), mesh=%s", n_dev, devices[0].platform,
             mesh.shape if mesh else None)

    cfg = TrainerConfig(
        dtype=args.dtype, impl=args.impl, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, label_smoothing=args.label_smoothing,
        grad_clip=args.grad_clip, loss_scale=args.loss_scale,
        chunk_batch=args.chunk_batch, duplicates=args.duplicates,
        adapt_grad_norm=args.adapt_grad_norm, sync_bn=args.sync_bn,
        shard_opt_state=args.shard_opt_state, model_ema=args.model_ema,
        allreduce_dtype=args.allreduce_dtype,
        flat_optim=args.flat_optim,
        average_output=args.duplicates > 1, print_freq=args.print_freq)
    trainer = Trainer(model, optim, num_classes, cfg, mesh=mesh,
                      seed=args.seed)
    if args.model_ema > 0:
        log.info("model EMA enabled (decay %.4g): validation and "
                 "model_best use the averaged weights (they lag early "
                 "in training)", args.model_ema)
    if args.tensorwatch:
        trainer.set_watcher(os.path.join(save_path, "watch.jsonl"))

    params, state = model.init(jax.random.PRNGKey(args.seed), trainer.policy)
    log.info("number of parameters: %d", param_count(params))

    best_prec1 = 0.0
    start_epoch = args.start_epoch
    training_steps = 0
    ckpt = None
    if args.import_torch:
        from convnet_tpu.utils.torch_import import load_torch_checkpoint
        # leaf dtypes are preserved by the importer, so the policy's
        # param placement from model.init carries over unchanged
        params, state, meta = load_torch_checkpoint(
            args.import_torch, model, params, state)
        log.info("imported torch checkpoint '%s' (epoch %s, best_prec1 %s)",
                 args.import_torch, meta.get("epoch"),
                 meta.get("best_prec1"))
    start_batch = 0
    if args.resume or args.evaluate:
        ckpt_path = args.resume or args.evaluate
        ckpt = load_checkpoint(ckpt_path)
        params = tree_dtype_cast_like(ckpt["params"], params)
        state = tree_dtype_cast_like(ckpt["state"], state)
        best_prec1 = float(ckpt.get("best_prec1", 0.0))
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        training_steps = int(ckpt.get("training_steps", 0))
        # a --save-freq mid-epoch checkpoint carries batch_idx: resume
        # INSIDE that epoch (the loader is epoch-seeded, so the skipped
        # batches replay identically)
        batch_idx = int(ckpt.get("batch_idx", 0) or 0)
        if args.resume and batch_idx:
            start_epoch = int(ckpt["epoch"])
            start_batch = batch_idx
        log.info("loaded checkpoint '%s' (epoch %s%s)", ckpt_path,
                 ckpt.get("epoch"),
                 f", batch {batch_idx}" if batch_idx else "")

    params, state, opt_state = trainer.initialize(params, state)
    if args.resume and ckpt.get("opt_state") is not None:
        # elastic resume: re-fit the optimizer state to the CURRENT
        # device count / ZeRO layout before placement
        restored = adapt_opt_state(ckpt["opt_state"], opt_state)
        restored = tree_dtype_cast_like(restored, opt_state)
        # preserve whatever placement initialize() chose for each leaf
        # (fully replicated, or ZeRO-1 P(data)-sharded flat moments) —
        # re-replicating a sharded moment vector would undo ZeRO-1
        opt_state = tree_place_like(restored, opt_state)
    trainer.training_steps = training_steps
    if args.resume and ckpt is not None and ckpt.get("rng") is not None:
        # restore the trainer's PRNG stream (mixup/augment keys) — makes
        # the resumed trajectory bit-identical to the uninterrupted one
        trainer.rng = jnp.asarray(np.asarray(ckpt["rng"], np.uint32))

    # ---- data regimes (model may author its own) --------------------
    defaults = {
        "name": args.dataset, "split": "train",
        "batch_size": args.batch_size, "num_workers": args.workers,
        "data_dir": args.datasets_dir, "duplicates": args.duplicates,
        "autoaugment": args.autoaugment,
        "cutout": {"length": 8} if args.cutout else None,
    }
    if args.no_augment:
        defaults["augment"] = False
    if args.input_size:
        defaults["input_size"] = args.input_size
    train_data = DataRegime(getattr(model, "data_regime", None),
                            defaults=defaults, seed=args.seed,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    eval_bs = args.eval_batch_size if args.eval_batch_size > 0 else args.batch_size
    eval_defaults = {**defaults, "split": "val", "augment": False,
                     "batch_size": eval_bs, "multicrop": args.multicrop,
                     "duplicates":
                     args.duplicates if cfg.average_output else 1}
    val_data = DataRegime(getattr(model, "data_eval_regime", None),
                          defaults=eval_defaults, seed=args.seed,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())

    # ---- BN folding / evaluate-only ---------------------------------
    if args.absorb_bn:
        from convnet_tpu.utils.absorb_bn import search_absorb_bn
        params, state = search_absorb_bn(params, state)
        log.info("folded BatchNorm into conv weights")

    if args.evaluate:
        if args.calibrate_bn:
            state = trainer.calibrate_bn(train_data.get_loader(), params, state)
        results = trainer.validate(val_data.get_loader(), params, state)
        log.info("evaluate: loss %.4f prec1 %.3f prec5 %.3f",
                 results["loss"], results["prec1"], results["prec5"])
        return results

    # ---- epoch loop (call stack §3.1 outer loop) --------------------
    results = ResultsLog(save_path, title=f"{args.model} on {args.dataset}")
    if args.resume:
        # reference parity (utils/log.py ~70–250 approx.): a resumed run
        # appends to the previous curves; drop rows from epochs the
        # resume will re-train
        results.load()
        results.rows = [r for r in results.rows
                        if int(r.get("epoch", -1)) < start_epoch]
    for epoch in range(start_epoch, args.epochs):
        train_data.set_epoch(epoch, trainer.training_steps)
        profiling = args.profile and epoch == start_epoch
        if profiling:
            try:
                jax.profiler.start_trace(os.path.join(save_path, "profile"))
            except Exception as e:  # device-side tracing may be
                log.warning("profiler unavailable: %s", e)  # unsupported
                profiling = False
        step_hook = None
        if args.save_freq and jax.process_index() == 0:
            def step_hook(p, s, o, batch_idx, _epoch=epoch):
                if batch_idx % args.save_freq:
                    return
                save_checkpoint(
                    {"epoch": _epoch, "batch_idx": batch_idx,
                     "model": args.model, "config": model_config,
                     "input_size": args.input_size,
                     "params": p, "state": s, "opt_state": o,
                     "best_prec1": best_prec1,
                     "training_steps": trainer.training_steps,
                     "rng": np.asarray(trainer.rng).tolist()},
                    False, save_path, background=True)
        params, state, opt_state, train_res = trainer.train_epoch(
            train_data.get_loader(), params, state, opt_state, epoch,
            start_batch=start_batch if epoch == start_epoch else 0,
            step_hook=step_hook)
        if profiling:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                log.warning("profiler stop failed: %s", e)

        val_data.set_epoch(epoch)
        # with --model-ema, validation (and model_best selection) uses
        # the averaged weights — the copy that would be served
        eval_params = trainer.ema_params(opt_state) or params
        val_res = trainer.validate(val_data.get_loader(), eval_params, state)

        is_best = val_res["prec1"] > best_prec1
        best_prec1 = max(val_res["prec1"], best_prec1)
        if jax.process_index() == 0:
            save_checkpoint(
                {"epoch": epoch, "model": args.model, "config": model_config,
                 # the run's explicit eval geometry (None = dataset
                 # default) — serving restores it (serve.py Predictor)
                 "input_size": args.input_size,
                 "params": params, "state": state, "opt_state": opt_state,
                 "best_prec1": best_prec1,
                 "training_steps": trainer.training_steps,
                 "rng": np.asarray(trainer.rng).tolist()},
                is_best, save_path, save_all=args.save_all,
                background=True)  # overlap disk write w/ next epoch

        log.info("epoch %d: train loss %.4f prec1 %.2f | val loss %.4f "
                 "prec1 %.2f prec5 %.2f | best %.2f | step p50 %.1f ms",
                 epoch, train_res["loss"], train_res["prec1"],
                 val_res["loss"], val_res["prec1"], val_res["prec5"],
                 best_prec1, 1e3 * train_res["step_time_p50"])
        results.add(epoch=epoch,
                    train_loss=train_res["loss"], val_loss=val_res["loss"],
                    train_prec1=train_res["prec1"], val_prec1=val_res["prec1"],
                    train_prec5=train_res["prec5"], val_prec5=val_res["prec5"],
                    step_time_p50=train_res["step_time_p50"],
                    data_time=train_res["data_time"],
                    epoch_time=train_res["epoch_time"],
                    img_per_sec=train_res["img_per_sec"],
                    lr=optim.hyperparams()["lr"])
        results.plot("epoch", ["train_loss", "val_loss"], "loss", "loss")
        results.plot("epoch", ["train_prec1", "val_prec1"], "top-1", "%")
        results.save()
    return {"best_prec1": best_prec1}


if __name__ == "__main__":
    main()
