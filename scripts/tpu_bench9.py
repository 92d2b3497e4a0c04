"""Session 9: remat, ResNet-101, large-batch-4k chunked configs."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench9_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

def bench(tag, name, mk, batch=256, chunk=1, k=10, img=224):
    m = models.build(name, **mk)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0, chunk_batch=chunk))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch,img,img,3), jnp.bfloat16); y = jnp.zeros((batch,), jnp.int32)
    tr.optim.update(0,0); hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step(); r = jax.random.PRNGKey(1)
    p,s,o,mt = step(p,s,o,x,y,hp,r); float(mt["loss"])
    t0=time.perf_counter()
    for _ in range(k): p,s,o,mt = step(p,s,o,x,y,hp,r)
    float(mt["loss"]); dt=(time.perf_counter()-t0)/k
    log(f"{tag}: {dt*1e3:.1f}ms = {batch/dt:.0f} img/s")

bench("rn50 remat", "resnet", dict(depth=50, remat=True))
bench("rn101 B=128", "resnet", dict(depth=101), batch=128)
bench("rn101 B=256", "resnet", dict(depth=101), batch=256)
try:
    bench("rn50 B=4096 chunked x16 (large-batch regime)", "resnet",
          dict(depth=50, regime="large", batch_size=4096), batch=4096,
          chunk=16, k=3)
except Exception as e:
    log(f"4k failed: {type(e).__name__} {str(e)[:100]}")
log("session 9 complete")
OUT.close()
