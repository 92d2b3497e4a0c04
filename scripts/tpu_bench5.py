"""TPU session 5: v4 hybrid pool + final model numbers."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench5_results.txt", "a")
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
rng = np.random.default_rng(0)
x = rng.standard_normal((4,112,112,64)).astype(np.float32)
g = jax.grad(lambda x_: jnp.sum(max_pool2d_pallas(x_,3,2,1)))(jnp.asarray(x))
xt = torch.tensor(np.transpose(x,(0,3,1,2)), requires_grad=True)
F.max_pool2d(xt,3,2,1).sum().backward()
np.testing.assert_allclose(np.transpose(np.asarray(g),(0,3,1,2)), xt.grad.numpy(), rtol=1e-4)
log("v4 pool compiled correct")
h = jnp.ones((256,112,112,64), jnp.bfloat16)
gr = jax.jit(jax.grad(lambda h: jnp.sum(max_pool2d_pallas(h,3,2,1).astype(jnp.float32))))
log(f"v4 pool B=256 fwd+bwd: {timed(gr,(h,)):.2f}ms (xla 22-24)")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
def bench_model(name, mk, impl, batch=256, k=15):
    m = models.build(name, **mk)
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
    log(f"{name}{mk} impl={impl} B={batch}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")
bench_model("resnet", dict(depth=50), "pallas")
bench_model("resnet", dict(depth=50, stem="s2d"), "pallas")
bench_model("mobilenet_v2", {}, "xla")
bench_model("mobilenet_v2", {}, "pallas")
log("session 5 complete")
OUT.close()
