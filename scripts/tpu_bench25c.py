"""Session 25c: default-dispatch zoo after strided-set pad-sum became
the universal pool backward; plus official bench.py numbers context.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench25_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"25c sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, k=10):
    m = models.build(name, **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    r0 = np.random.default_rng(0)
    x = jnp.asarray(r0.standard_normal((batch, img, img, 3)),
                    dtype=jnp.bfloat16)
    y = jnp.asarray(r0.integers(0, 1000, batch).astype(np.int32))
    tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
    t0 = time.perf_counter()
    for _ in range(k): p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"]); dt = (time.perf_counter() - t0) / k
    fin = np.isfinite(float(mt["loss"])) and np.isfinite(float(mt["grad_norm"]))
    log(f"25c {name}{mk} B={batch}@{img}: {dt*1e3:.1f}ms = "
        f"{batch/dt:.0f} img/s finite={fin}")

bench("vgg", dict(depth=16), batch=128)
bench("alexnet", {})
bench("resnet", dict(depth=18))
bench("resnet", dict(depth=34))
bench("inception_v3", {}, batch=128, img=299)
bench("densenet", dict(depth=121), batch=128)
bench("resnet", dict(depth=101))
bench("resnext", dict(depth=50))
bench("resnet", dict(depth=50), batch=512)
log("session 25c complete")
OUT.close()
