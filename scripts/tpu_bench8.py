"""Session 8: BN normalization-dtype experiment + fresh bench.py numbers."""
import sys, time, json
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench8_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

# --- experiment: bf16 normalization math (stats still fp32) --------
import convnet_tpu.ops.norm as norm_mod
orig = norm_mod.batch_norm_train
def bn_bf16(x, scale, bias, running_mean, running_var, *, momentum=0.1,
            eps=1e-5, axis_name=None, local_count=None, axis_size=1):
    from jax import lax
    mean, var = norm_mod._batch_moments(x, axis_name)
    inv = lax.rsqrt(var + eps)
    if scale is not None:
        inv = inv * scale.astype(jnp.float32)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    if local_count is None:
        local_count = x.size // x.shape[-1]
    n = local_count * (axis_size if axis_name is not None else 1)
    corr = n / max(n - 1, 1)
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * (var * corr)
    return y, new_mean, new_var

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
def bench(k=15):
    m = models.build("resnet", depth=50)
    tr = Trainer(m, OptimRegime(m.regime), 1000, TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((256,224,224,3), jnp.bfloat16); y = jnp.zeros((256,), jnp.int32)
    tr.optim.update(0,0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p,s,o,mt = step(p,s,o,x,y,hp,r); float(mt["loss"])
    t0=time.perf_counter()
    for _ in range(k): p,s,o,mt = step(p,s,o,x,y,hp,r)
    float(mt["loss"]); return (time.perf_counter()-t0)/k*1e3

t_base = bench()
log(f"rn50 fp32-norm BN: {t_base:.1f}ms")
norm_mod.batch_norm_train = bn_bf16
t_bf16 = bench()
log(f"rn50 bf16-norm BN: {t_bf16:.1f}ms")
norm_mod.batch_norm_train = orig
log("session 8 complete")
OUT.close()
