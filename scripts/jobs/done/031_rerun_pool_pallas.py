"""Job 031: RE-RUN of jobs 015/016 with FRESH modules — the first real
on-hardware exercise of ops/pallas/pool_bwd.py (the originals silently
fell back to padsum). Exactness + standalone + model level."""
import os
import time


def fetch1(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(leaves[0].ravel()[0])


def timeit(fn, *args, k=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


from convnet_tpu.ops import pool as P
from convnet_tpu.ops.pallas import pool_bwd as pb
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

log(f"fresh-module check: pallas bwd present={hasattr(P, '_mp_bwd_pallas')}")

shapes = [
    ("stem 3/2/1", 3, 2, 1, (256, 112, 112, 64)),
    ("gln-branch 3/1/1", 3, 1, 1, (256, 14, 14, 528)),
    ("gln-pool3 3/2/1", 3, 2, 1, (256, 28, 28, 480)),
    ("vgg 2/2/0", 2, 2, 0, (128, 224, 224, 64)),
]
for name, k, s, p, shape in shapes:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    x = jnp.round(x * 4) / 4

    def make_g(kind):
        os.environ["CONVNET_TPU_POOL_BWD"] = kind
        try:
            f = jax.jit(jax.grad(
                lambda x_: jnp.sum(P.max_pool2d(x_, k, s, p)
                                   .astype(jnp.float32) ** 2)))
            g = f(x)
            fetch1(g)
            return f, g
        finally:
            os.environ.pop("CONVNET_TPU_POOL_BWD", None)

    try:
        f_ref, g_ref = make_g("")
        f_pl, g_pl = make_g("pallas")
        err = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32)
                                    - g_pl.astype(jnp.float32))))
        t_ref = timeit(f_ref, x, k=15)
        t_pl = timeit(f_pl, x, k=15)
        log(f"{name} {shape}: maxerr {err:.2e} | padsum {t_ref:.2f} "
            f"| pallas {t_pl:.2f} ms")
    except Exception as e:
        log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


def measure(tag, name, kw, batch=256, image=224):
    m = models.build(name, **kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch, image, image, 3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    loss0 = float(mt["loss"])
    for _ in range(3):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag} {name}: {best:.1f} ms = {batch/best*1e3:.0f} img/s "
        f"(loss {loss0:.4f})")


for kind in ("", "pallas"):
    if kind:
        os.environ["CONVNET_TPU_POOL_BWD"] = kind
    else:
        os.environ.pop("CONVNET_TPU_POOL_BWD", None)
    measure(kind or "padsum", "resnet", {"depth": 50})
    measure(kind or "padsum", "googlenet", {})
os.environ.pop("CONVNET_TPU_POOL_BWD", None)
