"""Session 15 (round 2): session-14 experiments with a FIXED harness.

Session 14's timeit closed windows by fetching the full output array
(hundreds of MB over the ~67 MB/s relay) — every standalone-op number
there is garbage; only the full-model numbers (scalar-loss fetch) hold.
Here every window closes with a 1-element device slice fetch, and the
run must NOT share the host core with other jobs.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench15_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])  # 1-element slice → 4-byte fetch

def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k

from convnet_tpu import models
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

bench_rn50(256, " baseline")

# ---------------- pool bwd dtype ----------------
from convnet_tpu.ops import pool as pool_mod

x_pool = jnp.asarray(np.random.default_rng(0).standard_normal(
    (256,112,112,64)).astype(np.float32)).astype(jnp.bfloat16)

mp_f = jax.jit(lambda x: pool_mod.max_pool2d(x, 3, 2, 1))
log(f"pool fwd (argmax): {timeit(mp_f, x_pool)*1e3:.2f}ms")
mp_g = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                        .astype(jnp.float32).sum()))
log(f"pool fwd+bwd dy-dtype bwd (landed): {timeit(mp_g, x_pool)*1e3:.2f}ms")

# forced-fp32 backward (the round-1 behavior) for comparison
_landed_bwd = pool_mod._mp_bwd
def _mp_bwd_fp32(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    return _landed_bwd(kernel, stride, padding, x_shape, x_dtype, idx,
                       dy.astype(jnp.float32))
pool_mod._mp_bwd = _mp_bwd_fp32
pool_mod._make_max_pool.cache_clear()
mp_g2 = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                         .astype(jnp.float32).sum()))
log(f"pool fwd+bwd fp32-bwd (round 1): {timeit(mp_g2, x_pool)*1e3:.2f}ms")
diff = jax.jit(lambda x: jnp.abs(mp_g(x).astype(jnp.float32)
                                 - mp_g2(x).astype(jnp.float32)).max())
log(f"pool bwd dtype max|diff|: {float(diff(x_pool)):.5f}")
pool_mod._mp_bwd = _landed_bwd
pool_mod._make_max_pool.cache_clear()
bench_rn50(256, " landed-pool-bwd")

# ---------------- conv formulations ----------------
def conv_nhwc(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

def grad_time(f, x, w, k=20):
    g = jax.jit(jax.grad(lambda x, w: f(x, w).astype(jnp.float32).sum(),
                         argnums=(0, 1)))
    return timeit(g, x, w, k=k)

def fwd_time(f, x, w, k=20):
    return timeit(jax.jit(f), x, w, k=k)

rng = np.random.default_rng(1)
def arr(shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)

x56 = arr((256,56,56,64)); w33 = arr((3,3,64,64))
log(f"conv3x3 64-64@56 native: fwd {fwd_time(conv_nhwc,x56,w33)*1e3:.2f}ms "
    f"fwd+bwd {grad_time(conv_nhwc,x56,w33)*1e3:.2f}ms")

def conv_im2col(x, w):
    kh, kw, ci, co = w.shape
    pat = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (pat.reshape(-1, ci*kh*kw)
            @ w.transpose(2,0,1,3).reshape(ci*kh*kw, co))

log(f"conv3x3 64-64@56 im2col: fwd {fwd_time(conv_im2col,x56,w33)*1e3:.2f}ms "
    f"fwd+bwd {grad_time(conv_im2col,x56,w33)*1e3:.2f}ms")

x56b = arr((256,56,56,256)); w11a = arr((1,1,64,256)); w11b = arr((1,1,256,64))
log(f"conv1x1 64-256@56 native: fwd+bwd {grad_time(conv_nhwc,x56,w11a)*1e3:.2f}ms")
log(f"conv1x1 256-64@56 native: fwd+bwd {grad_time(conv_nhwc,x56b,w11b)*1e3:.2f}ms")
def mm1x1(x, w):
    b,h,wd,c = x.shape
    return (x.reshape(-1, c) @ w.reshape(c, -1)).reshape(b,h,wd,-1)
log(f"conv1x1 64-256@56 matmul: fwd+bwd {grad_time(mm1x1,x56,w11a)*1e3:.2f}ms")
log(f"conv1x1 256-64@56 matmul: fwd+bwd {grad_time(mm1x1,x56b,w11b)*1e3:.2f}ms")

x224 = arr((256,224,224,3)); w77 = arr((7,7,3,64))
def stem_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2,2), ((3,3),(3,3)), dimension_numbers=("NHWC","HWIO","NHWC"))
log(f"stem7x7/2 native: fwd {fwd_time(stem_native,x224,w77)*1e3:.2f}ms "
    f"fwd+bwd {grad_time(stem_native,x224,w77)*1e3:.2f}ms")
def stem_im2col(x, w):
    pat = jax.lax.conv_general_dilated_patches(
        x, (7,7), (2,2), ((3,3),(3,3)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return pat.reshape(-1, 147) @ w.transpose(2,0,1,3).reshape(147, 64)
log(f"stem7x7/2 im2col: fwd {fwd_time(stem_im2col,x224,w77)*1e3:.2f}ms "
    f"fwd+bwd {grad_time(stem_im2col,x224,w77)*1e3:.2f}ms")

x28 = arr((256,28,28,128)); w33b = arr((3,3,128,128))
log(f"conv3x3 128-128@28 native: fwd+bwd {grad_time(conv_nhwc,x28,w33b)*1e3:.2f}ms")
log(f"conv3x3 128-128@28 im2col: fwd+bwd {grad_time(conv_im2col,x28,w33b)*1e3:.2f}ms")

bench_rn50(384, " probe")
bench_rn50(512, " probe")
log("session 15 complete")
OUT.close()
