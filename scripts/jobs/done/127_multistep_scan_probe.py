"""Job 127 (round 4): can a multi-step lax.scan amortize the host gap?

Job 126 measured a constant ~2.3-2.7 ms/step wall-minus-device gap on
the fast models (AlexNet 12.6 device vs 14.9 wall; RN18 33.9 vs 36.3)
— host-side per-call dispatch on big pytree arguments that donation
cannot hide. If real, jitting ONE call that scans N train steps
(device-resident data) should recover up to 18% on AlexNet, ~6% on
RN18, ~2% on RN50. If the gap is actually device idle (scheduling,
tiny-op tails), scan will be neutral — another instance of the
"standalone timings lie" rule, but this one is a whole-step A/B.

Method: per-step time of the standard 1-step jitted call (the ledger
methodology) vs one jitted scan of N=2/8 steps over the same
device-resident batch (fresh RNG per inner step; donated carry).
"""

from functools import partial

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

import time as _t

MODELS = [
    ("alexnet", {}, 20),
    ("resnet", {"depth": 18}, 14),
    ("resnet", {"depth": 50}, 6),
]

for name, kw, k in MODELS:
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

    # --- baseline: 1 step per dispatch (ledger methodology) ---
    p1, s1, o1, mm = step(p, s, o, x, y, hp, r)
    fetch1(mm["loss"])
    t0 = _t.perf_counter()
    for _ in range(k):
        p1, s1, o1, mm = step(p1, s1, o1, x, y, hp, r)
    fetch1(mm["loss"])
    base = (_t.perf_counter() - t0) / k * 1e3
    log(f"{tag}: 1-step baseline {base:.2f} ms/step")

    for N in (2, 8):
        def multi(params, state, opt, x, y, hp, rng, n=N):
            def body(c, _):
                pp, ss, oo, rr = c
                rr, kk = jax.random.split(rr)
                pp, ss, oo, mt = step(pp, ss, oo, x, y, hp, kk)
                return (pp, ss, oo, rr), mt["loss"]
            (pp, ss, oo, rr), losses = jax.lax.scan(
                body, (params, state, opt, rng), None, length=n)
            return pp, ss, oo, losses[-1]

        mj = jax.jit(multi, donate_argnums=(0, 1, 2))
        pp, ss, oo, ll = mj(p1, s1, o1, x, y, hp, r)
        fetch1(ll)
        calls = max(2, k // N)
        t0 = _t.perf_counter()
        for _ in range(calls):
            pp, ss, oo, ll = mj(pp, ss, oo, x, y, hp, r)
        fetch1(ll)
        ms = (_t.perf_counter() - t0) / calls / N * 1e3
        log(f"{tag}: scan x{N}: {ms:.2f} ms/step ({base / ms:.3f}x)")
        p1, s1, o1 = pp, ss, oo

log("done: multi-step scan dispatch-amortization probe")
