"""Job 020: whole-zoo training throughput after round-3 changes
(save-output ReLU, pool cache-keying, importer fixes) — regression
check against the round-2 table (PERF_NOTES 'Full-zoo')."""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

CFGS = [
    ("alexnet", {}, 256, 224),
    ("mobilenet", {}, 256, 224),
    ("mobilenet_v2", {}, 256, 224),
    ("resnet", {"depth": 18}, 256, 224),
    ("resnet", {"depth": 34}, 256, 224),
    ("resnet", {"depth": 50}, 256, 224),
    ("googlenet", {}, 256, 224),
    ("densenet", {}, 128, 224),
    ("resnet", {"depth": 101}, 256, 224),
    ("resnet", {"depth": 50, "groups": 32, "width": [128, 256, 512, 1024]},
     256, 224),
    ("inception_v3", {}, 128, 299),
    ("vgg", {"depth": 16}, 128, 224),
]
for name, kw, batch, image in CFGS:
    try:
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
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(12):
                p, s, o, mt = step(p, s, o, x, y, hp, r)
            float(mt["loss"])
            dt = (time.perf_counter() - t0) / 12 * 1e3
            best = dt if best is None else min(best, dt)
        log(f"{name}{kw} B={batch}@{image}: {best:.1f} ms = "
            f"{batch/best*1e3:.0f} img/s")
        del p, s, o, step, tr, m
    except Exception as e:
        log(f"{name}{kw}: FAILED {type(e).__name__}: {str(e)[:200]}")
