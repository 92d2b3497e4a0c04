"""TPU session 2: decompose early-stage ResNet-50 cost (background-safe)."""

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = open("/root/repo/scripts/tpu_bench2_results.txt", "a")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


import jax
import jax.numpy as jnp
import numpy as np

log(f"sanity: {float(jnp.ones((2, 2)).sum())}")


def timed(fn, args, k=15):
    o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(k):
        o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / k * 1e3


from convnet_tpu import ops

B = 256

# ---- A. conv costs at layer1 geometry ----------------------------
# bottleneck block convs at 56x56: 1x1 64->64, 3x3 64->64, 1x1 64->256
for (cin, cout, k, note) in [(64, 64, 1, "l1 reduce"), (64, 64, 3, "l1 3x3"),
                             (64, 256, 1, "l1 expand"), (256, 64, 1, "l1 in"),
                             (128, 128, 3, "l2 3x3 @28"), ]:
    hw = 56 if "l1" in note else 28
    x = jnp.ones((B, hw, hw, cin), jnp.bfloat16)
    w = jnp.ones((k, k, cin, cout), jnp.bfloat16) * 0.01

    def f(x, w):
        return jnp.sum(ops.conv2d(x, w, stride=1, padding=k // 2)
                       .astype(jnp.float32))

    g = jax.jit(jax.grad(f, argnums=(0, 1)))
    t = timed(g, (x, w))
    flops = 3 * 2 * B * hw * hw * cin * cout * k * k
    log(f"conv {note} ({cin}->{cout} k{k} @{hw}): {t:.2f}ms "
        f"fwd+bwd = {flops/t/1e9:.0f} GFLOP/s")

# ---- B. BN train cost at layer1 geometry -------------------------
x = jnp.ones((B, 56, 56, 64), jnp.bfloat16)
sc = jnp.ones(64, jnp.float32)


def bn_f(x, sc):
    y, m, v = ops.batch_norm_train(x, sc, sc, sc, sc)
    return jnp.sum(y.astype(jnp.float32))


t = timed(jax.jit(jax.grad(bn_f, argnums=(0, 1))), (x, sc))
traffic = 2 * x.size * 2 * 3  # rough: read+write fwd + bwd passes
log(f"BN train 56x56x64 fwd+bwd: {t:.2f}ms (~{traffic/t/1e6:.0f} GB/s)")

x2 = jnp.ones((B, 56, 56, 256), jnp.bfloat16)
sc2 = jnp.ones(256, jnp.float32)
t = timed(jax.jit(jax.grad(bn_f, argnums=(0, 1))), (x2, sc2))
log(f"BN train 56x56x256 fwd+bwd: {t:.2f}ms")

# ---- C. full bottleneck block fwd+bwd ----------------------------
from convnet_tpu.models.resnet import Bottleneck, ConvBN
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import BF16_POLICY

blk = Bottleneck(256, 64)
p0, s0 = blk.init(jax.random.PRNGKey(0), BF16_POLICY)
xb = jnp.ones((B, 56, 56, 256), jnp.bfloat16)


def blk_f(p, x):
    ctx = Context(train=True, rng=jax.random.PRNGKey(0), policy=BF16_POLICY)
    y, _ = blk(p, s0, x, ctx)
    return jnp.sum(y.astype(jnp.float32))


t = timed(jax.jit(jax.grad(blk_f, argnums=(0, 1))), (p0, xb))
flops = 3 * 2 * B * 56 * 56 * (256 * 64 + 64 * 64 * 9 + 64 * 256) * 1
log(f"bottleneck block @56 fwd+bwd: {t:.2f}ms ({flops/t/1e9:.0f} GFLOP/s; "
    f"layer1 has 3 of these)")

# ---- D. stem variants in isolation -------------------------------
from convnet_tpu.nn.layers import SpaceToDepth

x224 = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
w7 = jnp.ones((7, 7, 3, 64), jnp.bfloat16) * 0.01


def stem7(x, w):
    return jnp.sum(ops.conv2d(x, w, stride=2, padding=3).astype(jnp.float32))


t = timed(jax.jit(jax.grad(stem7, argnums=(0, 1))), (x224, w7))
log(f"stem conv7x7/2 fwd+bwd: {t:.2f}ms")

w4 = jnp.ones((4, 4, 12, 64), jnp.bfloat16) * 0.01
s2d = SpaceToDepth(2)


def stem_s2d(x, w):
    xs, _ = s2d({}, {}, x, None)
    return jnp.sum(ops.conv2d(xs, w, stride=1,
                              padding=((2, 1), (2, 1))).astype(jnp.float32))


t = timed(jax.jit(jax.grad(stem_s2d, argnums=(0, 1))), (x224, w4))
log(f"stem s2d+conv4x4/1 fwd+bwd: {t:.2f}ms")

# ---- E. maxpool inside full graph context ------------------------
h = jnp.ones((B, 112, 112, 64), jnp.bfloat16)
mp = jax.jit(jax.grad(lambda h: jnp.sum(
    ops.max_pool2d(h, 3, 2, 1).astype(jnp.float32))))
t = timed(mp, (h,))
log(f"xla-custom-vjp maxpool fwd+bwd: {t:.2f}ms")

# ---- F. GAP + fc + CE + optimizer tail ---------------------------
log("session 2 complete")
OUT.close()
