"""Job 042: Inception-v3 aux-ON step cost (041's row hit a queue race)."""
import os
for key in list(os.environ):
    if key.startswith("CONVNET_TPU_"):
        del os.environ[key]
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("inception_v3", aux_classifiers=True)
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
x = jnp.ones((128, 299, 299, 3), jnp.bfloat16)
y = jnp.zeros((128,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)
p, s, o, mt = step(p, s, o, x, y, hp, r)
loss0 = float(mt["loss"])
for _ in range(2):
    p, s, o, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(15):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    dt = (time.perf_counter() - t0) / 15 * 1e3
    best = dt if best is None else min(best, dt)
log(f"inception aux-ON: {best:.1f} ms = {128/best*1e3:.0f} img/s "
    f"(loss {loss0:.4f})")
