"""Job 014: A/B of the save-output ReLU VJP (ops/activation.py) vs
jax.nn.relu at model level — RN50 and GoogLeNet B=256@224 bf16.
Expectation (job 013 analysis): the input-saving rule forces ~4.7 GB
of pre-activation bf16 writes per RN50 step; output-saving lets XLA
DCE them. Also checks grad parity on-chip (first-step loss + gnorm).
"""
import importlib
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


for env in ("0", "1"):
    os.environ["CONVNET_TPU_RELU_VJP"] = env
    tag = "relu-in " if env == "0" else "relu-out"
    measure(tag, "resnet", {"depth": 50})
    measure(tag, "googlenet", {})
os.environ.pop("CONVNET_TPU_RELU_VJP", None)
