"""TPU session 3: validate pool v3 + final bench comparison."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench3_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()

import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

def timed(fn, args, k=15):
    o = fn(*args); float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(k): o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter()-t0)/k*1e3

from convnet_tpu.ops.pallas.pool import max_pool2d_pallas
import torch, torch.nn.functional as F
# compiled correctness first (small)
rng = np.random.default_rng(0)
x = rng.standard_normal((4,112,112,64)).astype(np.float32)
out = max_pool2d_pallas(jnp.asarray(x), 3, 2, 1)
ref = F.max_pool2d(torch.tensor(np.transpose(x,(0,3,1,2))), 3,2,1).numpy()
np.testing.assert_allclose(np.transpose(np.asarray(out),(0,3,1,2)), ref, rtol=1e-5)
g = jax.grad(lambda x_: jnp.sum(max_pool2d_pallas(x_,3,2,1)))(jnp.asarray(x))
xt = torch.tensor(np.transpose(x,(0,3,1,2)), requires_grad=True)
F.max_pool2d(xt,3,2,1).sum().backward()
np.testing.assert_allclose(np.transpose(np.asarray(g),(0,3,1,2)), xt.grad.numpy(), rtol=1e-4)
log("pool v3 compiled correct vs torch")

h = jnp.ones((256,112,112,64), jnp.bfloat16)
fwd = jax.jit(lambda h: max_pool2d_pallas(h,3,2,1))
log(f"pool v3 B=256 fwd: {timed(fwd,(h,)):.2f}ms (xla 2.8, v2 21.2)")
gr = jax.jit(jax.grad(lambda h: jnp.sum(max_pool2d_pallas(h,3,2,1).astype(jnp.float32))))
log(f"pool v3 B=256 fwd+bwd: {timed(gr,(h,)):.2f}ms (xla 22-24, v2 31.4)")

# full rn50 with pallas pool
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
def bench_train(name, mk, impl, batch, k=15):
    m = models.build("resnet", **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000, TrainerConfig(dtype="bf16", impl=impl, print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch,224,224,3), jnp.bfloat16); y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0,0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p,s,o,mt = step(p,s,o,x,y,hp,r); float(mt["loss"])
    t0=time.perf_counter()
    for _ in range(k): p,s,o,mt = step(p,s,o,x,y,hp,r)
    float(mt["loss"]); dt=(time.perf_counter()-t0)/k
    log(f"rn50 [{name}] impl={impl} B={batch}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")

bench_train("conv7", dict(depth=50), "pallas", 256)
bench_train("conv7", dict(depth=50), "xla", 256)
log("session 3 complete")
OUT.close()
