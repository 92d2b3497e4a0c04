"""Session 23: pool-carrying-zoo re-measure after the erratum-class
max-pool rework (ops/pool.py _erratum_class), with finiteness checks.

NOTE tpu_bench22.py's 122.9 ms GoogLeNet number is a HARNESS BUG — it
fetched the loss inside the timed loop (one ~25 ms relay round-trip per
iteration). This uses the session-15/19 discipline (k dispatches, one
1-element fetch) so numbers are comparable to tpu_bench19_results.txt.
Random (not ones) inputs; train-step timing + train/eval finiteness.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench23_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")
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
        loss_f = np.isfinite(float(mt["loss"]))
        gn_f = np.isfinite(float(mt["grad_norm"]))
        ev = tr._make_eval_step()(p, s, x, y)
        ev_f = bool(np.isfinite(np.asarray(
            ev["loss"], dtype=np.float32)).all())
        log(f"{name}{mk} B={batch}@{img}: {dt*1e3:.1f}ms = {batch/dt:.0f} "
            f"img/s | finite train={loss_f and gn_f} eval={ev_f}")
    except Exception as e:
        log(f"{name}{mk}: FAILED {type(e).__name__}: {str(e)[:160]}")

# bench("resnet", dict(depth=50))  # done 22:53
# bench("resnet", dict(depth=18))  # done 22:54
bench("googlenet", {})
bench("googlenet", dict(aux_classifiers=True))
bench("alexnet", {})
bench("vgg", dict(depth=16), batch=128)
bench("inception_v3", {}, batch=128, img=299)
bench("densenet", dict(depth=121), batch=128)
log("session 23 zoo complete")
OUT.close()
