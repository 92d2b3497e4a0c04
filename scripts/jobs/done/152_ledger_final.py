"""Job 152 (round 5, final): end-of-round full-zoo ledger freshness sweep.

Same 14 rows, same bench.py methodology as jobs 101/129 (3 windows,
middle, fetch-closed, XLA cost analysis). Run on the FINAL round-5
tree (post grouped-conv tiled-dense + post self-review hardening) so
docs/BENCHMARKS.md's table is certified current at round end. Expect
every row within noise of the ledger; ResNeXt-50 at its round-5
value (~160 ms).
"""

import time as _t

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

ROWS = [
    ("alexnet", {}, 256, 224, 40),
    ("mobilenet", {}, 256, 224, 24),
    ("mobilenet_v2", {}, 256, 224, 20),
    ("resnet", {"depth": 18}, 256, 224, 24),
    ("resnet", {"depth": 34}, 256, 224, 18),
    ("resnet", {"depth": 50}, 256, 224, 12),
    ("googlenet", {}, 256, 224, 14),
    ("densenet", {"depth": 121}, 128, 224, 14),
    ("resnet", {"depth": 101}, 256, 224, 8),
    ("resnext", {"depth": 50}, 256, 224, 8),
    ("inception_v3", {}, 128, 299, 12),
    ("inception_resnet_v2", {}, 128, 299, 8),
    ("inception_v4", {}, 128, 299, 8),
    ("vgg", {"depth": 16}, 128, 224, 10),
]

for name, kw, B, res, steps in ROWS:
    tag = f"{name}{kw.get('depth', '')}"
    try:
        m = models.build(name, **kw)
        tr = Trainer(m, OptimRegime(m.regime), 1000,
                     TrainerConfig(dtype="bf16", print_freq=0))
        p, s = m.init(jax.random.PRNGKey(0), tr.policy)
        p, s, o = tr.initialize(p, s)
        x = jnp.ones((B, res, res, 3), jnp.bfloat16)
        y = jnp.zeros((B,), jnp.int32)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        r = jax.random.PRNGKey(1)

        compiled = step.lower(p, s, o, x, y, hp, r).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gf = float(cost.get("flops", 0)) / 1e9
        gb = float(cost.get("bytes accessed", 0)) / 1e9

        p, s, o, mm = step(p, s, o, x, y, hp, r)
        fetch1(mm["loss"])
        for _ in range(3):
            p, s, o, mm = step(p, s, o, x, y, hp, r)
        fetch1(mm["loss"])

        def window(k):
            global p, s, o
            t0 = _t.perf_counter()
            for _ in range(k):
                p, s, o, mm = step(p, s, o, x, y, hp, r)
            fetch1(mm["loss"])
            return (_t.perf_counter() - t0) / k * 1e3

        w = sorted(window(steps) for _ in range(3))
        ms = w[1]
        mfu = gf / 197e3 / ms * 1e3
        sol = (gb / 819) / ms * 1e3
        log(f"{tag}: B{B}@{res} {ms:.1f} ms {B/ms*1e3:,.0f} img/s | "
            f"{gf:,.0f} GF {gb:.1f} GB | MFU {mfu*100:.1f}% "
            f"HBM-SoL {sol*100:.1f}%")
        del m, tr, p, s, o, x, y, compiled
    except Exception as e:  # keep the sweep alive per-row
        log(f"{tag}: FAILED {type(e).__name__}: {e}")

log("done: end-of-round ledger freshness sweep")
