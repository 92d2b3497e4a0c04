"""Job 032: RE-RUN of job 017 with FRESH modules — the original's
'remat-l1' arm rematted ALL stages (stale resnet.py treated the tuple
as a bool). First real selective-remat measurement."""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig


def measure(tag, batch, **model_kw):
    m = models.build("resnet", depth=50, **model_kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
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
    for _ in range(2):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag} B={batch}: {best:.1f} ms = {batch/best*1e3:.0f} img/s")


measure("no-remat", 512)
measure("remat-l1", 512, remat=("layer1",))
measure("remat-stem+l1... n/a use l1l2", 512, remat=("layer1", "layer2"))
