"""Job 030: RE-RUN of jobs 012/014 with FRESH modules (the originals
measured stale code against itself — worker module-caching bug).
A/B: save-output ReLU and 1x1-conv dot backward at RN50 model level."""
import os
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.ops import activation as act_mod


def measure(tag, name="resnet", kw={"depth": 50}, batch=256, image=224):
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
    loss0 = float(mt["loss"])
    gn = float(mt.get("grad_norm", jnp.zeros(())))
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
    log(f"{tag} {name}: {best:.1f} ms = {batch/best*1e3:.0f} img/s "
        f"(loss {loss0:.4f} gnorm {gn:.4f})")


# sanity: the fresh module really has the round-3 symbols
log(f"fresh-module check: has relu={hasattr(act_mod, '_relu_out')}")

os.environ["CONVNET_TPU_RELU_VJP"] = "0"
measure("relu-in ")
os.environ["CONVNET_TPU_RELU_VJP"] = "1"
measure("relu-out")
measure("relu-out", "googlenet", {})
os.environ.pop("CONVNET_TPU_RELU_VJP", None)

for mode in ("dgrad", "wgrad", "both"):
    os.environ["CONVNET_TPU_1X1_BWD"] = mode
    measure(f"1x1-{mode}")
os.environ.pop("CONVNET_TPU_1X1_BWD", None)
