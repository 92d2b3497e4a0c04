"""Job 146 (round 5): quantify the host-side inter-step gap and
prototype a multi-step-per-dispatch train call (lax.scan over K staged
batches around the Trainer's step closure).

Motivation (docs/BENCHMARKS.md round-4 reading): per-op traces showed a
constant ~2.3-2.7 ms/step of host-side inter-step time on the fast
models (jobs 119-126) -- ~20%% of AlexNet's 13.5 ms step and most of
ResNet-50's remaining ~4%% gap to its 101 ms bytes floor. One dispatch
per K steps amortizes it away, the standard TPU idiom.

Arms per model:
  loop   -- current bench methodology: K sequential step_fn dispatches,
            one closing fetch (this is what bench.py measures).
  scanK  -- ONE jitted call: lax.scan over K distinct staged batches
            (xs resident on device), same hp each step, rng split per
            step inside the scan. Per-step time = call time / K.

Models: ResNet-50 B256@224 (the headline) and AlexNet-BN B256@224 (the
model where the constant gap is the largest fraction).
"""
import time

import jax.numpy as jnp_
from jax import lax, random

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig


def build(name, **cfg):
    model = models.build(name, **cfg)
    optim = OptimRegime(model.regime)
    trainer = Trainer(model, optim, num_classes=1000,
                      config=TrainerConfig(dtype="bf16", print_freq=0))
    params, state = model.init(random.PRNGKey(0))
    params, state, opt_state = trainer.initialize(params, state)
    optim.update(0, 0)
    hp = trainer._hp_device(optim.hyperparams())
    return trainer, params, state, opt_state, hp


def time_loop(step_fn, params, state, opt_state, x, y, hp, rng, k):
    # warmup/compile
    params, state, opt_state, m = step_fn(params, state, opt_state, x, y, hp, rng)
    fetch1(m["loss"])
    for _ in range(3):
        params, state, opt_state, m = step_fn(params, state, opt_state, x, y, hp, rng)
    fetch1(m["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            params, state, opt_state, m = step_fn(
                params, state, opt_state, x, y, hp, rng)
        fetch1(m["loss"])
        dt = (time.perf_counter() - t0) / k * 1e3
        best = dt if best is None else min(best, dt)
    return best, params, state, opt_state


def make_multi(trainer, K):
    import jax as j
    inner = trainer._make_train_step(trainer.optim.optimizer_name)
    # un-jitted closure is not exposed; scan over the JITTED step works
    # (jit-of-jit inlines) but to be safe build the scan around the
    # jitted fn and jit the whole thing -- XLA inlines the inner call.

    def multi(params, state, opt_state, xs, ys, hp, rng):
        def body(carry, inp):
            params, state, opt_state, rng = carry
            xi, yi = inp
            rng, kk = random.split(rng)
            params, state, opt_state, m = inner(
                params, state, opt_state, xi, yi, hp, kk)
            return (params, state, opt_state, rng), m["loss"]
        (params, state, opt_state, _), losses = lax.scan(
            body, (params, state, opt_state, rng), (xs, ys))
        return params, state, opt_state, losses
    return j.jit(multi, donate_argnums=(0, 1, 2))


def time_scan(trainer, params, state, opt_state, hp, batch, image, K, reps):
    multi = make_multi(trainer, K)
    xs = jnp_.ones((K, batch, image, image, 3), jnp_.bfloat16)
    ys = jnp_.zeros((K, batch), jnp_.int32)
    rng = random.PRNGKey(1)
    params, state, opt_state, losses = multi(params, state, opt_state, xs, ys, hp, rng)
    fetch1(losses)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            params, state, opt_state, losses = multi(
                params, state, opt_state, xs, ys, hp, rng)
        fetch1(losses)
        dt = (time.perf_counter() - t0) / (reps * K) * 1e3
        best = dt if best is None else min(best, dt)
    return best


for name, cfg, batch, loop_k in (
        ("resnet", {"depth": 50}, 256, 20),
        ("alexnet", {}, 256, 40)):
    trainer, params, state, opt_state, hp = build(name, **cfg)
    x = jnp_.ones((batch, 224, 224, 3), jnp_.bfloat16)
    y = jnp_.zeros((batch,), jnp_.int32)
    step_fn = trainer._get_train_step()
    rng = random.PRNGKey(1)
    t_loop, params, state, opt_state = time_loop(
        step_fn, params, state, opt_state, x, y, hp, rng, loop_k)
    log(f"{name}: loop dispatch {t_loop:.2f} ms/step")
    for K in (4, 8):
        reps = max(2, loop_k // K)
        # fresh trainer per K so donation bookkeeping stays clean
        trainer2, p2, s2, o2, hp2 = build(name, **cfg)
        t_scan = time_scan(trainer2, p2, s2, o2, hp2, batch, 224, K, reps)
        log(f"{name}: scan K={K}: {t_scan:.2f} ms/step "
            f"({t_loop / t_scan:.3f}x vs loop)")
