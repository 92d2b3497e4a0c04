"""Session 24: full-zoo refresh after the pad-sum max-pool backward
(compare: session 19 = interleave bwd, session 23 = safe-pool rework).
Every pool-carrying model should gain; also re-checks the B=512 RN50
memory-pressure residual. Finiteness-checked train + eval.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench24_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"24 sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, k=10):
    try:
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
        fin = (np.isfinite(float(mt["loss"]))
               and np.isfinite(float(mt["grad_norm"])))
        ev = tr._make_eval_step()(p, s, x, y)
        ev_f = bool(np.isfinite(float(ev["loss"])))
        log(f"{name}{mk} B={batch}@{img}: {dt*1e3:.1f}ms = {batch/dt:.0f} "
            f"img/s | finite train={fin} eval={ev_f}")
    except Exception as e:
        log(f"{name}{mk}: FAILED {type(e).__name__}: {str(e)[:160]}")

bench("alexnet", {})
bench("mobilenet", {})
bench("mobilenet_v2", {})
bench("resnet", dict(depth=18))
bench("resnet", dict(depth=34))
bench("resnet", dict(depth=50))
bench("resnet", dict(depth=50), batch=512)
bench("googlenet", {})
bench("densenet", dict(depth=121), batch=128)
bench("resnet", dict(depth=101))
bench("resnext", dict(depth=50))
bench("inception_v3", {}, batch=128, img=299)
bench("vgg", dict(depth=16), batch=128)
log("session 24 complete")
OUT.close()
