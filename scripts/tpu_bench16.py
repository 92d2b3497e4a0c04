"""Session 16 (round 2): 1x1-as-dot full-model A/B + stage re-decomposition.

Baseline after the bf16 pool bwd: RN50 B=256 @ 114.5 ms (session 15).
A. full RN50 step with CONVNET_TPU_1X1_DOT on/off (both compiled here
   via module reload of the flag — subprocesses avoided to hold one
   chip grant).
B. cumulative stage timing at the new baseline to re-target.
C. pool bwd variant: H-interleave-first ordering.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench16_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

from convnet_tpu import models
from convnet_tpu.ops import conv as conv_mod
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench_rn50(batch=256, label="", k=10, **cfg):
    m = models.build("resnet", depth=50)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0, **cfg))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch,224,224,3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0,0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p,s,o,mt = step(p,s,o,x,y,hp,r); float(mt["loss"])
    t0=time.perf_counter()
    for _ in range(k): p,s,o,mt = step(p,s,o,x,y,hp,r)
    float(mt["loss"]); dt=(time.perf_counter()-t0)/k
    log(f"RN50{label} B={batch}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")
    return dt

conv_mod._DOT_1X1 = False
bench_rn50(256, " conv-1x1")
conv_mod._DOT_1X1 = True
bench_rn50(256, " dot-1x1")

# ---------------- stage decomposition (cumulative trunk prefixes) ----
from convnet_tpu.core.module import Context
m = models.build("resnet", depth=50)
from convnet_tpu.core.dtypes import get_policy
policy = get_policy("bf16")
p, s = m.init(jax.random.PRNGKey(0), policy)
x = jnp.ones((256,224,224,3), jnp.bfloat16)

def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])

def timeit(fn, *args, k=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k

stage_names = ["layer1", "layer2", "layer3", "layer4"]
def make_prefix(n_stages):
    def f(p, s, x):
        def loss(p):
            ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=policy)
            h, st = m.stem(p["stem"], s["stem"], x, ctx)
            for name in stage_names[:n_stages]:
                h, _ = m.layers[name](p["layers"][name],
                                      s["layers"][name], h, ctx)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(loss)(p)
    return jax.jit(f)

prev = 0.0
for n in range(0, 5):
    try:
        dt = timeit(make_prefix(n), p, s, x)
        log(f"stem+{n}stages fwd+bwd: {dt*1e3:.1f}ms (delta {1e3*(dt-prev):+.1f})")
        prev = dt
    except Exception as e:
        log(f"stage prefix {n} FAILED {type(e).__name__}: {str(e)[:100]}")
        break

log("session 16 complete")
OUT.close()
