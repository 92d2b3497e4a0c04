"""Job 012: model-level A/B of pointwise-conv backward formulations.

RN50 B=256@224 bf16 train step under:
  base      — native conv path everywhere
  dgrad     — 1x1 dgrad as dot (CONVNET_TPU_1X1_BWD=dgrad)
  wgrad     — 1x1 wgrad as dot
  both      — both grads as dots
  dot1x1    — full dot formulation incl. forward (_DOT_1X1 monkeypatch)
"""
import os
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.ops import conv as conv_mod


def measure(tag):
    m = models.build("resnet", depth=50)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((256,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    loss0 = float(mt["loss"])
    for _ in range(3):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag}: {best:.1f} ms = {256/best*1e3:.0f} img/s "
        f"(first loss {loss0:.4f})")
    return best


os.environ.pop("CONVNET_TPU_1X1_BWD", None)
measure("base")
for mode in ("dgrad", "wgrad", "both"):
    os.environ["CONVNET_TPU_1X1_BWD"] = mode
    measure(mode)
os.environ.pop("CONVNET_TPU_1X1_BWD", None)
conv_mod._DOT_1X1 = True
measure("dot1x1-full")
conv_mod._DOT_1X1 = False
