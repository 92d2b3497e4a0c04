"""Job 101 (round 4): whole-zoo speed-of-light ledger.

VERDICT r3 #2: extend the zoo table with per-model FLOP-SoL (MFU) and
BW-SoL (%HBM) from XLA cost analysis of the compiled train step, so
"speed-of-light" is a measured per-model gap. Output feeds
docs/BENCHMARKS.md and bench.py's new fields.
"""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0

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
    ("resnext", {"depth": 50}, 256, 224),
    ("inception_v3", {}, 128, 299),
    ("inception_resnet_v2", {}, 128, 299),
    ("vgg", {"depth": 16}, 128, 224),
]
rows = []
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
        mfu = flops / 1e12 / (best / 1e3) / PEAK_TFLOPS
        hbm = bts / 1e9 / (best / 1e3) / HBM_GBPS
        floor_flop = flops / 1e12 / PEAK_TFLOPS * 1e3   # ms
        floor_bw = bts / 1e9 / HBM_GBPS * 1e3            # ms
        rows.append((name, kw, batch, image, best, batch / best * 1e3,
                     flops / 1e9, bts / 1e9, mfu, hbm, floor_flop, floor_bw))
        log(f"{name}{kw} B={batch}@{image}: {best:.1f} ms = "
            f"{batch/best*1e3:.0f} img/s | {flops/1e9:.0f} GF "
            f"{bts/1e9:.2f} GB | MFU {mfu*100:.1f}% | HBM {hbm*100:.1f}% | "
            f"floors flop={floor_flop:.1f} bw={floor_bw:.1f} ms")
        del p, s, o, step, tr, m
    except Exception as e:
        log(f"{name}{kw}: FAILED {type(e).__name__}: {str(e)[:200]}")

log("=== LEDGER (markdown) ===")
log("| model | config | batch@res | p50 ms | img/s | step GF | step GB "
    "| MFU | %HBM-SoL | bound |")
log("|---|---|---|---|---|---|---|---|---|---|")
for (name, kw, b, i, ms, ips, gf, gb, mfu, hbm, ff, fb) in rows:
    bound = "BW" if fb > ff else "FLOP"
    log(f"| {name} | {kw} | {b}@{i} | {ms:.1f} | {ips:.0f} | {gf:.0f} | "
        f"{gb:.2f} | {mfu*100:.1f}% | {hbm*100:.1f}% | {bound} |")
