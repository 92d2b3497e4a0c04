"""Job 128 (round 4): multi-step scan vs 1-step dispatch, BENCH-grade.

Job 127 showed scan-x8 RN50 at 106.1 ms vs a 110.8 ms 1-step baseline
— but that baseline was a single mean-of-6 window, above the ledger's
best-of-windows p50 (104.6). Decide with the exact bench.py
methodology for BOTH arms: 3 windows of ~30 steps, middle window,
per-step ms. If scan-x8 p50 < 1-step p50 by >1% this is a real
dispatch-amortization win worth wiring; if they meet at ~104.6 the
job-127 delta was window noise/stragglers.
"""

import time as _t

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

MODELS = [
    ("alexnet", {}, 60),
    ("resnet", {"depth": 50}, 30),
]

for name, kw, steps in MODELS:
    tag = f"{name}{kw.get('depth', '')}"
    m = models.build(name, **kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    B = 256
    x = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((B,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)

    # ---- arm A: 1-step dispatch (bench.py methodology) ----
    p, s, o, mm = step(p, s, o, x, y, hp, r)
    fetch1(mm["loss"])
    for _ in range(3):
        p, s, o, mm = step(p, s, o, x, y, hp, r)
    fetch1(mm["loss"])

    def window_1step(k):
        global p, s, o
        t0 = _t.perf_counter()
        for _ in range(k):
            p, s, o, mm = step(p, s, o, x, y, hp, r)
        fetch1(mm["loss"])
        return (_t.perf_counter() - t0) / k * 1e3

    w = sorted(window_1step(steps) for _ in range(3))
    log(f"{tag}: 1-step windows {w[0]:.2f}/{w[1]:.2f}/{w[2]:.2f} "
        f"-> p50 {w[1]:.2f} ms/step")

    # ---- arm B: scan x8 per dispatch, same total steps/window ----
    N = 8

    def multi(params, state, opt, x, y, hp, rng):
        def body(c, _):
            pp, ss, oo, rr = c
            rr, kk = jax.random.split(rr)
            pp, ss, oo, mt = step(pp, ss, oo, x, y, hp, kk)
            return (pp, ss, oo, rr), mt["loss"]
        (pp, ss, oo, rr), losses = jax.lax.scan(
            body, (params, state, opt, rng), None, length=N)
        return pp, ss, oo, losses[-1]

    mj = jax.jit(multi, donate_argnums=(0, 1, 2))
    p, s, o, ll = mj(p, s, o, x, y, hp, r)
    fetch1(ll)

    def window_scan(calls):
        global p, s, o
        t0 = _t.perf_counter()
        for _ in range(calls):
            p, s, o, ll = mj(p, s, o, x, y, hp, r)
        fetch1(ll)
        return (_t.perf_counter() - t0) / (calls * N) * 1e3

    calls = max(2, steps // N)
    w2 = sorted(window_scan(calls) for _ in range(3))
    log(f"{tag}: scan-x8 windows {w2[0]:.2f}/{w2[1]:.2f}/{w2[2]:.2f} "
        f"-> p50 {w2[1]:.2f} ms/step ({w[1] / w2[1]:.3f}x vs 1-step)")

log("done: bench-grade multi-step scan A/B")
