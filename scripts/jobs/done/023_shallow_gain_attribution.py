"""Job 023: attribute the round-3 shallow-model gains (RN18 5732 ->
7086 img/s, AlexNet 13081 -> 17133 vs the round-2 table): A/B the
save-output ReLU flag, plus resnext{depth:50} under the ROUND-2 config
for a like-for-like zoo row."""
import os
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig


def measure(tag, name, kw, batch=256, image=224):
    m = models.build(name, **kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((batch, image, image, 3), jnp.bfloat16)
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
        for _ in range(15):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 15 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag} {name}{kw}: {best:.1f} ms = {batch/best*1e3:.0f} img/s")


for env in ("1", "0"):
    os.environ["CONVNET_TPU_RELU_VJP"] = env
    tag = "relu-out" if env == "1" else "relu-in "
    measure(tag, "resnet", {"depth": 18})
    measure(tag, "alexnet", {})
os.environ.pop("CONVNET_TPU_RELU_VJP", None)
measure("r2-config", "resnext", {"depth": 50})
