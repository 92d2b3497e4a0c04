"""Session 18: separable max-pool (1 sublane interleave in bwd) A/B."""
import sys, time, os
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench18_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

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
    return (time.perf_counter() - t0) / k

from convnet_tpu.ops import pool as pm

x_pool = jnp.asarray(np.random.default_rng(0).standard_normal(
    (256,112,112,64)).astype(np.float32)).astype(jnp.bfloat16)

leg = pm._make_max_pool((3,3),(2,2),(1,1), x_pool.shape, "bfloat16")
sep = pm._make_max_pool_separable((3,3),(2,2),(1,1), x_pool.shape, "bfloat16")
log(f"legacy fwd: {timeit(jax.jit(leg), x_pool)*1e3:.2f}ms")
log(f"separable fwd: {timeit(jax.jit(sep), x_pool)*1e3:.2f}ms")
gl = jax.jit(jax.grad(lambda x: leg(x).astype(jnp.float32).sum()))
gs = jax.jit(jax.grad(lambda x: sep(x).astype(jnp.float32).sum()))
log(f"legacy fwd+bwd: {timeit(gl, x_pool)*1e3:.2f}ms")
log(f"separable fwd+bwd: {timeit(gs, x_pool)*1e3:.2f}ms")
d = jax.jit(lambda x: jnp.abs(gl(x).astype(jnp.float32)
                              - gs(x).astype(jnp.float32)).max())
log(f"bwd max|diff|: {float(d(x_pool)):.5f}")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, label="", k=10):
    m = models.build(name, **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch,img,img,3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0,0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p,s,o,mt = step(p,s,o,x,y,hp,r); float(mt["loss"])
    t0=time.perf_counter()
    for _ in range(k): p,s,o,mt = step(p,s,o,x,y,hp,r)
    float(mt["loss"]); dt=(time.perf_counter()-t0)/k
    log(f"{name}{label} B={batch}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")

os.environ["CONVNET_TPU_SEPARABLE_POOL"] = "0"
bench("resnet", dict(depth=50), label=" legacy-pool")
os.environ["CONVNET_TPU_SEPARABLE_POOL"] = "1"
bench("resnet", dict(depth=50), label=" sep-pool")
bench("googlenet", {}, label=" sep-pool")
os.environ["CONVNET_TPU_SEPARABLE_POOL"] = "0"
bench("googlenet", {}, label=" legacy-pool")
os.environ["CONVNET_TPU_SEPARABLE_POOL"] = "1"
bench("resnet", dict(depth=50), batch=512, label=" sep-pool")
log("session 18 complete")
OUT.close()
