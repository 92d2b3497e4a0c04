"""Session 26: RN50 stage re-decomposition at the 104.6 ms baseline
(after the strided-set pad-sum pool backward), to re-target the
remaining headroom toward the 2600 img/s goal. Also isolates the stem
conv vs pool split and times the avg-pool (autodiff) backward used by
DenseNet/Inception transitions.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench26_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"26 sanity {float(jnp.ones((2,2)).sum())}")

from convnet_tpu import models, ops
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import get_policy


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


policy = get_policy("bf16")
m = models.build("resnet", depth=50)
p, s = m.init(jax.random.PRNGKey(0), policy)
x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)

stage_names = ["layer1", "layer2", "layer3", "layer4"]

def make_prefix(n_stages):
    def f(p_, s_, x_):
        def loss(p_):
            ctx = Context(train=True, rng=jax.random.PRNGKey(0),
                          policy=policy)
            h, st = m.stem(p_["stem"], s_["stem"], x_, ctx)
            for name in stage_names[:n_stages]:
                h, _ = m.layers[name](p_["layers"][name],
                                      s_["layers"][name], h, ctx)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(loss)(p_)
    return jax.jit(f)

prev = 0.0
for n in range(0, 5):
    dt = timeit(make_prefix(n), p, s, x)
    log(f"stem+{n}stages fwd+bwd: {dt:.1f}ms (delta {dt - prev:+.1f})")
    prev = dt

# stem split: conv+bn+relu only vs + pool
def stem_conv_only(p_, s_, x_):
    def loss(p_):
        ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=policy)
        h, _ = m.stem.layers["conv1"](p_["stem"]["conv1"],
                                      s_["stem"]["conv1"], x_, ctx)
        return jnp.sum(h.astype(jnp.float32))
    return jax.grad(loss)(p_)

try:
    dt = timeit(jax.jit(stem_conv_only), p, s, x)
    log(f"stem conv+bn+relu only fwd+bwd: {dt:.1f}ms")
except Exception as e:
    log(f"stem split skipped: {type(e).__name__}: {str(e)[:120]}")

# avg-pool autodiff bwd at DenseNet transition scale
for shape, cfg in [((128, 56, 56, 128), (2, 2, 0)),
                   ((128, 28, 28, 256), (2, 2, 0)),
                   ((128, 35, 35, 288), (3, 1, 1))]:
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    k_, s_, p_ = cfg
    g = jax.jit(jax.grad(
        lambda x_: jnp.sum(ops.avg_pool2d(x_, k_, s_, p_)
                           .astype(jnp.float32))))
    log(f"avg_pool {cfg} {shape} autodiff fwd+bwd: {timeit(g, xa):.2f}ms")

log("session 26 complete")
OUT.close()
