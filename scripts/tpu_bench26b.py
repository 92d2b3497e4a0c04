"""Session 26b: custom avg-pool VJP (pad-sum + strided-set) on-chip —
standalone vs the autodiff backward it replaces, and DenseNet-121 /
Inception-v3 / GoogLeNet model-level (all carry avg pools).
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench26_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu import ops
from convnet_tpu.ops import pool as pm
log(f"26b sanity {float(jnp.ones((2,2)).sum())}")


def fetch1(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, k=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


for shape, cfg in [((128, 56, 56, 128), (2, 2, 0)),
                   ((128, 28, 28, 256), (2, 2, 0)),
                   ((128, 35, 35, 288), (3, 1, 1))]:
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    k_, s_, p_ = cfg
    g_new = jax.jit(jax.grad(
        lambda x_: jnp.sum(ops.avg_pool2d(x_, k_, s_, p_)
                           .astype(jnp.float32))))
    g_auto = jax.jit(jax.grad(
        lambda x_: jnp.sum(pm._ap_fwd(x_, (k_, k_), (s_, s_), (p_, p_),
                                      True).astype(jnp.float32))))
    d = float(jnp.abs(g_new(xa).astype(jnp.float32)
                      - g_auto(xa).astype(jnp.float32)).max())
    log(f"avg_pool {cfg} {shape}: autodiff {timeit(g_auto, xa):6.2f} ms | "
        f"padsum-vjp {timeit(g_new, xa):6.2f} ms | max|diff| {d:.2e}")

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
    log(f"26b {name}{mk} B={batch}@{img}: {dt*1e3:.1f}ms = "
        f"{batch/dt:.0f} img/s finite={fin}")

bench("densenet", dict(depth=121), batch=128)
bench("inception_v3", {}, batch=128, img=299)
bench("googlenet", {})
log("session 26b complete")
OUT.close()
