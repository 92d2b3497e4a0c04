"""Session 26c: RN50 stem A/B (default 7x7/2 vs space-to-depth) at the
current 104.6 ms baseline, plus official-config RN50 re-baseline in the
same process for a clean delta.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench26_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"26c sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(mk, batch=256, k=10):
    m = models.build("resnet", **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
    t0 = time.perf_counter()
    for _ in range(k): p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"]); dt = (time.perf_counter() - t0) / k
    log(f"26c resnet{mk} B={batch}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")

bench(dict(depth=50))
bench(dict(depth=50, stem="s2d"))
log("session 26c complete")
OUT.close()
