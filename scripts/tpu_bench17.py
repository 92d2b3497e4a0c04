"""Session 17 (round 2): pool-bwd relayout attack + block fusion audit.

Session 16: pool bwd ~13 ms vs ~1.3 ms bandwidth bound → relayout-ALU
bound, dominated by the W-axis (sublane) interleaves. The pool is
H/W-symmetric, so V2 runs the whole backward TRANSPOSED (W↔H) and
transposes back: both interleaves then act on the cheap major axis,
paying 2 optimized XLA transposes instead of 3 sublane interleaves.
Also: bottleneck-block micro-timings to audit BN/epilogue fusion @56².
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench17_results.txt", "a")
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

from convnet_tpu.ops import pool as pool_mod

x_pool = jnp.asarray(np.random.default_rng(0).standard_normal(
    (256,112,112,64)).astype(np.float32)).astype(jnp.bfloat16)

mp_g = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                        .astype(jnp.float32).sum()))
log(f"pool fwd+bwd V1 (landed): {timeit(mp_g, x_pool)*1e3:.2f}ms")

# V2: transpose-sandwich backward (symmetric pool params only)
_landed_bwd = pool_mod._mp_bwd
def _mp_bwd_T(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    kh, kw = pool_mod._pair(kernel); sh, sw = pool_mod._pair(stride)
    ph, pw = pool_mod._pair(padding)
    if (kh, sh, ph) != (kw, sw, pw):
        return _landed_bwd(kernel, stride, padding, x_shape, x_dtype, idx, dy)
    b, h, w, c = x_shape
    # tap index transposes as t = di*kw+dj -> dj*kh+di
    di = idx // kw
    dj = idx - di * kw
    idx_t = (dj * kh + di).astype(jnp.uint8)
    dy_t = jnp.swapaxes(dy, 1, 2)
    idx_t = jnp.swapaxes(idx_t, 1, 2)
    dx_t = _landed_bwd(kernel, stride, padding, (b, w, h, c), x_dtype,
                       idx_t, dy_t)
    return jnp.swapaxes(dx_t, 1, 2)

pool_mod._mp_bwd = _mp_bwd_T
pool_mod._make_max_pool.cache_clear()
mp_g2 = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                         .astype(jnp.float32).sum()))
log(f"pool fwd+bwd V2 (transpose-sandwich): {timeit(mp_g2, x_pool)*1e3:.2f}ms")
diff = jax.jit(lambda x: jnp.abs(mp_g(x).astype(jnp.float32)
                                 - mp_g2(x).astype(jnp.float32)).max())
log(f"V2 max|diff|: {float(diff(x_pool)):.5f}")
pool_mod._mp_bwd = _landed_bwd
pool_mod._make_max_pool.cache_clear()

# V3: half the interleaves transposed — transpose only for the COLUMN
# (W) interleave step, rows stay native. Implemented as: transpose
# inputs, do rows-first (axis1=W' interleave on old W? no) — skip;
# V2 covers the hypothesis.

# ---------------- bottleneck fusion audit @56^2 ----------------
from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import get_policy
from convnet_tpu.models.resnet import Bottleneck, ConvBN

policy = get_policy("bf16")
rng = np.random.default_rng(1)
def arr(shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)

blk = Bottleneck(256, 64)
bp, bs = blk.init(jax.random.PRNGKey(0), policy)
x56 = arr((256,56,56,256))

def blk_grad(p, s, x):
    def loss(p):
        ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=policy)
        y, _ = blk(p, s, x, ctx)
        return jnp.sum(y.astype(jnp.float32))
    return jax.grad(loss)(p)
log(f"bottleneck(256->64->256)@56 fwd+bwd: {timeit(jax.jit(blk_grad), bp, bs, x56)*1e3:.2f}ms")

cb = ConvBN(64, 64, 3, 1, 1)
cp, cs = cb.init(jax.random.PRNGKey(0), policy)
x56s = arr((256,56,56,64))
def cb_grad(p, s, x):
    def loss(p):
        ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=policy)
        y, _ = cb(p, s, x, ctx)
        return jnp.sum(y.astype(jnp.float32))
    return jax.grad(loss)(p)
log(f"ConvBN 3x3 64-64@56 fwd+bwd: {timeit(jax.jit(cb_grad), cp, cs, x56s)*1e3:.2f}ms")

# BN alone @56^2 x64 train fwd+bwd
from convnet_tpu import ops
def bn_grad(x, scale, bias):
    def loss(args):
        scale, bias = args
        y, m, v = ops.batch_norm_train(x, scale, bias,
                                       jnp.zeros(64), jnp.ones(64))
        return jnp.sum(y.astype(jnp.float32))
    return jax.grad(loss)((scale, bias))
log(f"BN train 64@56 fwd+bwd(scale,bias): "
    f"{timeit(jax.jit(bn_grad), x56s, jnp.ones(64), jnp.zeros(64))*1e3:.2f}ms")

log("session 17 complete")
OUT.close()
