"""Job 122 (round 4): flat-optimizer model-level A/B on the live chip.

Jobs 120/121 attributed ~15.5 ms of Inception-v4's 150 ms step to
1,625 tiny per-leaf optimizer fusions and measured the flattened
SGD+momentum update 6.8x faster in isolation (17.8 -> 2.6 ms at IV4's
449-leaf census). The flat update path is now wired as the Trainer
default (TrainerConfig.flat_optim, regimes/optim.make_flat_update_fn).
This job measures the MODEL-LEVEL win: full train step, tree arm
(flat_optim=False) vs flat arm (True), per zoo member, same
batch/res as the docs/BENCHMARKS.md ledger. Also records the flat
arm's XLA bytes-accessed so the ledger's GB/%HBM columns can be
refreshed where the step changed.
"""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0

CFGS = [
    ("resnet", {"depth": 50}, 256, 224),
    ("mobilenet_v2", {}, 256, 224),
    ("mobilenet", {}, 256, 224),
    ("googlenet", {}, 256, 224),
    ("densenet", {}, 128, 224),
    ("resnext", {"depth": 50}, 256, 224),
    ("inception_v3", {}, 128, 299),
    ("inception_resnet_v2", {}, 128, 299),
    ("inception_v4", {}, 128, 299),
]


def run_arm(name, kw, batch, image, flat):
    m = models.build(name, **kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0,
                               flat_optim=flat))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    n_leaves = len(jax.tree_util.tree_leaves(p))
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
    for _ in range(3):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    fetch1(mt["loss"])
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(12):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        fetch1(mt["loss"])
        dt = (time.perf_counter() - t0) / 12 * 1e3
        best = dt if best is None else min(best, dt)
    loss = fetch1(mt["loss"])
    return best, flops, bts, n_leaves, loss


rows = []
for name, kw, batch, image in CFGS:
    try:
        t_tree, fl, b_tree, nl, loss_t = run_arm(name, kw, batch, image,
                                                 flat=False)
        t_flat, _, b_flat, _, loss_f = run_arm(name, kw, batch, image,
                                               flat=True)
        sp = t_tree / t_flat
        rows.append((name, kw, batch, image, nl, t_tree, t_flat, sp,
                     b_tree, b_flat, fl))
        log(f"{name}{kw} B={batch}@{image} leaves={nl}: tree "
            f"{t_tree:.1f} ms vs flat {t_flat:.1f} ms = {sp:.3f}x | "
            f"bytes {b_tree/1e9:.2f} -> {b_flat/1e9:.2f} GB | "
            f"loss {loss_t:.4f}/{loss_f:.4f} | flat "
            f"{batch/t_flat*1e3:.0f} img/s")
    except Exception as e:
        import traceback
        log(f"{name}{kw}: FAILED {type(e).__name__}: {str(e)[:300]}")
        log(traceback.format_exc()[-800:])

log("=== SUMMARY (markdown) ===")
log("| model | leaves | tree ms | flat ms | speedup | flat img/s | "
    "flat GB | MFU | %HBM |")
log("|---|---|---|---|---|---|---|---|---|")
for (name, kw, b, i, nl, tt, tf, sp, bt, bf, fl) in rows:
    mfu = fl / 1e12 / (tf / 1e3) / PEAK_TFLOPS
    hbm = bf / 1e9 / (tf / 1e3) / HBM_GBPS
    log(f"| {name}{kw if kw else ''} | {nl} | {tt:.1f} | {tf:.1f} | "
        f"{sp:.3f}x | {b/tf*1e3:.0f} | {bf/1e9:.2f} | {mfu*100:.1f}% | "
        f"{hbm*100:.1f}% |")
