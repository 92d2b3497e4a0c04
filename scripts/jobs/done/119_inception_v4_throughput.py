"""Job 119 (round 4): Inception-v4 on-chip training throughput + SoL
ledger row (new zoo member, job-101 methodology)."""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

for batch, image in [(128, 299)]:
    m = models.build("inception_v4")
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
    cost = step.lower(p, s, o, x, y, hp, r).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bts = float(cost.get("bytes accessed", 0.0))
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
    log(f"inception_v4 B={batch}@{image}: {best:.1f} ms = "
        f"{batch/best*1e3:.0f} img/s | {flops/1e9:.0f} GF "
        f"{bts/1e9:.2f} GB | MFU {flops/1e12/(best/1e3)/197*100:.1f}% | "
        f"HBM {bts/1e9/(best/1e3)/819*100:.1f}%")
