"""Job 080: Inception-ResNet-v2 on-chip training throughput (new zoo
member, round-3 session 4) — B=64 and B=128 @299, bf16, same
methodology as job 020."""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

for batch in (64, 128):
    try:
        m = models.build("inception_resnet_v2")
        tr = Trainer(m, OptimRegime(m.regime), 1000,
                     TrainerConfig(dtype="bf16", print_freq=0))
        p, s = m.init(jax.random.PRNGKey(0), tr.policy)
        p, s, o = tr.initialize(p, s)
        x = jnp.ones((batch, 299, 299, 3), jnp.bfloat16)
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
        log(f"inception_resnet_v2 B={batch}@299: {best:.1f} ms = "
            f"{batch/best*1e3:.0f} img/s (loss {float(mt['loss']):.3f})")
        del p, s, o, step, tr, m
    except Exception as e:
        log(f"B={batch}: FAILED {type(e).__name__}: {str(e)[:300]}")
