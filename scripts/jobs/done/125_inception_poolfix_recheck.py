"""Job 125 (round 4): throughput recheck after the canonical
count_include_pad=False fix to IV4/IRv2 branch avg-pools.

The fix divides border windows by in-bounds tap counts (extra count
plane per pool in fwd + scaled cotangent in bwd). Branch pools are a
tiny slice of these models' 98-130 GB steps, so expect noise-level;
this job pins that expectation to a number against the job 101/119
ledger rows (IV4 153.8 ms / 832 img/s; IRv2 142.1 ms @ B=128@299).
"""

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

for name, ledger_ms in [("inception_v4", 153.8),
                        ("inception_resnet_v2", 142.1)]:
    m = models.build(name)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    B = 128
    x = jnp.ones((B, 299, 299, 3), jnp.bfloat16)
    y = jnp.zeros((B,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)

    def one(p, s, o):
        pp, ss, oo, mm = step(p, s, o, x, y, hp, r)
        return pp, ss, oo, mm

    # warmup/compile then time k dispatches closed by one fetch
    p, s, o, mm = one(p, s, o)
    fetch1(mm["loss"])
    import time as _t
    k = 10
    t0 = _t.perf_counter()
    for _ in range(k):
        p, s, o, mm = one(p, s, o)
    fetch1(mm["loss"])
    ms = (_t.perf_counter() - t0) / k * 1e3
    log(f"{name}: {ms:.1f} ms/step ({B / ms * 1e3:.0f} img/s) vs "
        f"ledger {ledger_ms} ms -> {ms / ledger_ms:.3f}x")

log("done: pool-semantics fix throughput recheck")
