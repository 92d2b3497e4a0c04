"""Session 24b: VGG/AlexNet re-measure after config-aware pool-bwd
dispatch (k<=s -> interleave, k>s -> pad-sum). Session 24 showed VGG
2/2/0 pools lose 13% under forced pad-sum; AlexNet 3/2/0 within noise.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench24_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"24b sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, k=10):
    m = models.build(name, **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                    dtype=jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, batch).astype(np.int32))
    tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
    t0 = time.perf_counter()
    for _ in range(k): p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"]); dt = (time.perf_counter() - t0) / k
    log(f"24b {name}{mk} B={batch}@{img}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")

bench("vgg", dict(depth=16), batch=128)
bench("alexnet", {})

log("session 24b complete")
OUT.close()
