"""Session 25b: pad-sum bwd with strided-set placement — standalone +
model-level (RN50, GoogLeNet), and forced-padsum VGG (does strided-set
placement now beat the interleave for k==s pools?).
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench25_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu.ops import pool as pm
log(f"25b sanity {float(jnp.ones((2,2)).sum())}")


def fetch1(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


B, HO, WO, C = 256, 56, 56, 64
rng = np.random.default_rng(0)
dy = jnp.asarray(rng.standard_normal((B, HO, WO, C)), dtype=jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, 9, (B, HO, WO, C)).astype(np.uint8))


@jax.jit
def full_bwd(dy_, idx_):
    return pm._mp_bwd_padsum((3, 3), (2, 2), (1, 1), (B, 112, 112, C),
                             "bfloat16", idx_, dy_)


log(f"padsum bwd (strided-set placement) standalone: "
    f"{timeit(full_bwd, dy, idx):6.2f} ms  (pad placement was 12.54)")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, k=10, tag=""):
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
    log(f"25b {name}{mk}{tag} B={batch}@{img}: {dt*1e3:.1f}ms = "
        f"{batch/dt:.0f} img/s finite={fin}")

bench("resnet", dict(depth=50))
bench("googlenet", {})
os.environ["CONVNET_TPU_POOL_BWD"] = "padsum"
pm._make_max_pool.cache_clear()
bench("vgg", dict(depth=16), batch=128, tag=" forced-padsum")
del os.environ["CONVNET_TPU_POOL_BWD"]
log("session 25b complete")
OUT.close()
