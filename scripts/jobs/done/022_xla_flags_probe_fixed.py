"""Job 022: compiler-options probe, fixed — job 019 donated its inputs
into the first run and every later candidate hit 'Array has been
deleted'. Keep host copies and device_put fresh trees per run."""
import time

import numpy as np

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("resnet", depth=50)
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p0, s0 = m.init(jax.random.PRNGKey(0), tr.policy)
p0, s0, o0 = tr.initialize(p0, s0)
HOST = jax.tree_util.tree_map(lambda a: np.asarray(a), (p0, s0, o0))
x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)
y = jnp.zeros((256,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)
lowered = step.lower(p0, s0, o0, x, y, hp, r)

CANDIDATES = [
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_latency_hiding_scheduler_rerun": "2"},
    {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"},
    {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"},
]


def run_compiled(comp, tag):
    p, s, o = jax.tree_util.tree_map(jnp.asarray, HOST)
    p, s, o, mt = comp(p, s, o, x, y, hp, r)
    loss0 = float(mt["loss"])
    for _ in range(3):
        p, s, o, mt = comp(p, s, o, x, y, hp, r)
    float(mt["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            p, s, o, mt = comp(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag}: {best:.1f} ms = {256/best*1e3:.0f} img/s (loss {loss0:.4f})")


run_compiled(lowered.compile(), "baseline")
for opts in CANDIDATES:
    tag = ",".join(f"{k}={v}" for k, v in opts.items())
    try:
        comp = lowered.compile(compiler_options=opts)
    except Exception as e:
        log(f"{tag}: REJECTED {type(e).__name__}: {str(e)[:150]}")
        continue
    try:
        run_compiled(comp, tag)
    except Exception as e:
        log(f"{tag}: RUN FAILED {type(e).__name__}: {str(e)[:150]}")
