"""Careful TPU benchmark session — run in background, never kill
(killing a client mid-compile wedges the chip grant for ~45 min).

Steps are ordered safest-first and results are flushed to
scripts/tpu_bench_results.txt as they complete.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = open("/root/repo/scripts/tpu_bench_results.txt", "a")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


import jax
import jax.numpy as jnp
import numpy as np

log(f"devices: {jax.devices()}")
log(f"sanity: {float(jnp.ones((2, 2)).sum())}")


def timed(fn, args, k=20):
    o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(k):
        o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / k * 1e3


# ---- 1. pallas pool scaling --------------------------------------
from convnet_tpu.ops.pallas.pool import max_pool2d_pallas

for B in (8, 64, 256):
    h = jnp.ones((B, 112, 112, 64), jnp.bfloat16)
    fwd = jax.jit(lambda h: max_pool2d_pallas(h, 3, 2, 1))
    t_f = timed(fwd, (h,), k=10)
    grad = jax.jit(jax.grad(
        lambda h: jnp.sum(max_pool2d_pallas(h, 3, 2, 1).astype(jnp.float32))))
    t_g = timed(grad, (h,), k=10)
    log(f"pallas pool B={B}: fwd {t_f:.2f}ms fwd+bwd {t_g:.2f}ms "
        f"(xla B=256: fwd 2.8 / 22)")

# correctness spot-check compiled vs torch
import torch
import torch.nn.functional as F
rng = np.random.default_rng(0)
x = rng.standard_normal((4, 112, 112, 64)).astype(np.float32)
out = max_pool2d_pallas(jnp.asarray(x), 3, 2, 1)
ref = F.max_pool2d(torch.tensor(np.transpose(x, (0, 3, 1, 2))), 3, 2, 1).numpy()
np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
                           rtol=1e-5)
g = jax.grad(lambda x_: jnp.sum(max_pool2d_pallas(x_, 3, 2, 1)))(jnp.asarray(x))
xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
F.max_pool2d(xt, 3, 2, 1).sum().backward()
np.testing.assert_allclose(np.transpose(np.asarray(g), (0, 3, 1, 2)),
                           xt.grad.numpy(), rtol=1e-4)
log("pallas pool compiled == torch (fwd+bwd) OK")

# ---- 2. fused matmul kernel vs XLA -------------------------------
from convnet_tpu.ops.pallas.matmul_fused import matmul_scale_act

M, K, N = 256 * 196, 1024, 256
xm = jnp.ones((M, K), jnp.bfloat16)
wm = jnp.ones((K, N), jnp.bfloat16)
sc = jnp.ones(N, jnp.float32)
sh = jnp.zeros(N, jnp.float32)
pal = jax.jit(lambda x, w, s, b: matmul_scale_act(x, w, s, b))
t_pal = timed(pal, (xm, wm, sc, sh))
xla = jax.jit(lambda x, w, s, b: jnp.maximum(
    jnp.matmul(x, w).astype(jnp.float32) * s + b, 0).astype(jnp.bfloat16))
t_xla = timed(xla, (xm, wm, sc, sh))
flops = 2 * M * K * N
log(f"fused matmul {M}x{K}x{N}: pallas {t_pal:.3f}ms "
    f"({flops/t_pal/1e9:.0f} GF/s) xla {t_xla:.3f}ms "
    f"({flops/t_xla/1e9:.0f} GF/s)")

# ---- 3. ResNet-50 train step variants ----------------------------
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig


def bench_train(name, model_kwargs, impl, batch, k=15):
    m = models.build("resnet", **model_kwargs)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", impl=impl, print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    t0 = time.perf_counter()
    for _ in range(k):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    dt = (time.perf_counter() - t0) / k
    log(f"rn50 train [{name}] impl={impl} B={batch}: {dt*1e3:.1f}ms = "
        f"{batch/dt:.0f} img/s")
    return batch / dt


base = bench_train("conv7", dict(depth=50), "xla", 256)
pal = bench_train("conv7", dict(depth=50), "pallas", 256)
s2d = bench_train("s2d", dict(depth=50, stem="s2d"), "pallas", 256)
try:
    b512 = bench_train("s2d", dict(depth=50, stem="s2d"), "pallas", 512, k=10)
except Exception as e:
    log(f"B=512 failed: {type(e).__name__}: {str(e)[:120]}")

log("session complete")
OUT.close()
