"""Session 23c: pad-sum vs interleave max-pool backward on-chip.

The interleave backward's stack+reshape dimension merges lower to
sublane shuffles; the pad-sum formulation assembles residue classes
with lax.pad interior padding + adds only. Times standalone fwd+bwd at
pool-carrying shapes (bf16 B=256) and the full RN50/GoogLeNet steps
with each backward.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench23_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu.ops import pool as pm
log(f"23c sanity {float(jnp.ones((2,2)).sum())}")


def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


def pool_grad(bwd_impl, x, k, s, p):
    shape, dt = x.shape, str(x.dtype)

    @jax.custom_vjp
    def mp(x_):
        return pm._mp_fwd_reduce_window(x_, k, s, p)

    def fwd(x_):
        out = pm._mp_fwd_reduce_window(x_, k, s, p)
        return out, pm._mp_idx_from_out(x_, out, k, s, p)

    def bwd(idx, dy):
        return (bwd_impl(k, s, p, shape, dt, idx, dy),)

    mp.defvjp(fwd, bwd)
    return jax.jit(jax.grad(lambda x_: jnp.sum(mp(x_).astype(jnp.float32))))


for shape in [(256, 112, 112, 64), (256, 56, 56, 192), (256, 28, 28, 480)]:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                    dtype=jnp.bfloat16)
    g_int = pool_grad(pm._mp_bwd_interleave, x, (3, 3), (2, 2), (1, 1))
    g_pad = pool_grad(pm._mp_bwd_padsum, x, (3, 3), (2, 2), (1, 1))
    d = float(jnp.abs(g_int(x).astype(jnp.float32)
                      - g_pad(x).astype(jnp.float32)).max())
    log(f"{shape} 3/2/1 fwd+bwd: interleave {timeit(g_int, x):6.2f} ms | "
        f"padsum {timeit(g_pad, x):6.2f} ms | max|diff| {d:.2e}")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench_model(name, mk, batch=256, img=224, k=10):
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
    fin = np.isfinite(float(mt["loss"])) and np.isfinite(float(mt["grad_norm"]))
    log(f"{name}{mk} bwd={os.environ.get('CONVNET_TPU_POOL_BWD','padsum')} "
        f"B={batch}@{img}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s finite={fin}")

bench_model("resnet", dict(depth=50))
bench_model("googlenet", {})
log("session 23c complete")
OUT.close()
