"""Session 17b: isolate the V2 compiler abort + block fusion audits.

The V2 transpose-sandwich pool bwd SIGABRTs the axon TPU compile
helper (session 17). It is numerically exact on CPU, so probe the
pieces: big swapaxes, uint8 // arithmetic, int32 tap remap variant.
Each probe is try/except — the abort surfaces as a catchable
JaxRuntimeError in the client.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench17b_results.txt", "a")
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

def probe(name, fn, *args, **kw):
    try:
        log(f"{name}: {timeit(fn, *args, **kw)*1e3:.2f}ms")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:90]}")

rng = np.random.default_rng(0)
def arr(shape, dt=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dt)

big = arr((256,112,112,64))
probe("swapaxes 112x112x64", jax.jit(lambda x: jnp.swapaxes(x, 1, 2) + 0), big)

idx8 = jnp.asarray(rng.integers(0, 9, (256,56,56,64)), jnp.uint8)
probe("u8 floordiv", jax.jit(lambda i: (i // 3).astype(jnp.float32)), idx8)
probe("u8 remap via table-free int32",
      jax.jit(lambda i: ((i.astype(jnp.int32) % 3) * 3
                         + i.astype(jnp.int32) // 3).astype(jnp.float32)), idx8)

# V2 with int32 remap + explicit transposes
from convnet_tpu.ops import pool as pool_mod
_landed = pool_mod._mp_bwd
def _mp_bwd_T(kernel, stride, padding, x_shape, x_dtype, idx, dy):
    kh, kw = pool_mod._pair(kernel); sh, sw = pool_mod._pair(stride)
    ph, pw = pool_mod._pair(padding)
    b, h, w, c = x_shape
    ii = idx.astype(jnp.int32)
    idx_t = ((ii % kw) * kh + ii // kw).astype(jnp.uint8)
    dx_t = _landed(kernel, stride, padding, (b, w, h, c), x_dtype,
                   jnp.swapaxes(idx_t, 1, 2), jnp.swapaxes(dy, 1, 2))
    return jnp.swapaxes(dx_t, 1, 2)

mp_g = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                        .astype(jnp.float32).sum()))
probe("pool V1 fwd+bwd", mp_g, big)
pool_mod._mp_bwd = _mp_bwd_T
pool_mod._make_max_pool.cache_clear()
mp_g2 = jax.jit(jax.grad(lambda x: pool_mod.max_pool2d(x, 3, 2, 1)
                         .astype(jnp.float32).sum()))
probe("pool V2i32 fwd+bwd", mp_g2, big)
try:
    diff = jax.jit(lambda x: jnp.abs(mp_g(x).astype(jnp.float32)
                                     - mp_g2(x).astype(jnp.float32)).max())
    log(f"V2i32 max|diff|: {float(diff(big)):.5f}")
except Exception as e:
    log(f"V2i32 diff: FAILED {type(e).__name__}")
pool_mod._mp_bwd = _landed
pool_mod._make_max_pool.cache_clear()

# ---------------- block fusion audits ----------------
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import get_policy
from convnet_tpu.models.resnet import Bottleneck, ConvBN
from convnet_tpu import ops

policy = get_policy("bf16")

def block_probe(name, mod, x):
    p, s = mod.init(jax.random.PRNGKey(0), policy)
    def g(p, s, x):
        def loss(p):
            ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=policy)
            y, _ = mod(p, s, x, ctx)
            return jnp.sum(y.astype(jnp.float32))
        return jax.grad(loss)(p)
    probe(name, jax.jit(g), p, s, x)

block_probe("bottleneck 256-64-256@56 fwd+bwd", Bottleneck(256, 64),
            arr((256,56,56,256)))
block_probe("bottleneck 512-128-512@28 fwd+bwd", Bottleneck(512, 128),
            arr((256,28,28,512)))
block_probe("ConvBN 3x3 64-64@56 fwd+bwd", ConvBN(64, 64, 3, 1, 1),
            arr((256,56,56,64)))
block_probe("ConvBN 1x1 256-64@56 fwd+bwd", ConvBN(256, 64, 1),
            arr((256,56,56,256)))

def bn_g(x, sc, b):
    def loss(args):
        sc, b = args
        y, m, v = ops.batch_norm_train(x, sc, b, jnp.zeros(64), jnp.ones(64))
        return jnp.sum(y.astype(jnp.float32))
    return jax.grad(loss)((sc, b))
probe("BN train 64@56 fwd+bwd", jax.jit(bn_g), arr((256,56,56,64)),
      jnp.ones(64), jnp.zeros(64))

log("session 17b complete")
OUT.close()
