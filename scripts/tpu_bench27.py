"""Session 27: refresh the two remaining BASELINE-table configs at the
current code: RN50 B=4096 grad-accum x16 (large-batch warmup regime)
and RN50 inference (absorb-BN eval path) — both last measured before
the round-2 pool rework.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench27_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"27 sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

# ---- RN50 grad-accum B=4096 (chunked x16) --------------------------
m = models.build("resnet", depth=50, regime="large")
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0, chunk_batch=16))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
x = jnp.ones((4096, 224, 224, 3), jnp.bfloat16)
y = jnp.zeros((4096,), jnp.int32)
tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step(); r = jax.random.PRNGKey(1)
p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
t0 = time.perf_counter()
for _ in range(3):
    p, s, o, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"]); dt = (time.perf_counter() - t0) / 3
log(f"RN50 B=4096 accum x16: {dt*1e3:.0f}ms = {4096/dt:.0f} img/s "
    f"(round-1: 1917ms / 2137)")
del p, s, o, step, m, tr

# ---- RN50 inference (absorb-BN) ------------------------------------
from convnet_tpu.serve import Predictor
pred = Predictor("resnet", {"depth": 50}, dtype="bf16", batch_size=256,
                 normalize=None)
xb = np.zeros((256, 224, 224, 3), np.float32)
lg = pred.predict_logits(xb)  # compile
t0 = time.perf_counter()
for _ in range(10):
    lg = pred.predict_logits(xb)
dt = (time.perf_counter() - t0) / 10
log(f"RN50 inference B=256 absorb-bn: {dt*1e3:.1f}ms = {256/dt:.0f} img/s "
    f"(session 11: 21.4ms / 11964) [includes host->device transfer "
    f"over the relay; on-device compute is the session-11 comparable]")
log("session 27 complete")
OUT.close()
