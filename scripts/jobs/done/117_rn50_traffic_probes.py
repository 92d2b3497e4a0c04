"""Job 117 (round 4): the two RN50 traffic-REDUCING probes (VERDICT r3
#4) + whole-step bytes budget close-out.

(a) bf16 BN-stat gradient reductions: CONVNET_TPU_BN_STAT_DTYPE... not
    a shipped flag — probe at op level instead: time the train step
    with BN moments computed in bf16 (monkeypatched norm) vs fp32.
(b) remat-for-bandwidth at B=256: jax.checkpoint with a
    save-dots-only policy on layer1+layer2 (recompute cheap elementwise
    chains in backward instead of re-reading) — distinct from the
    B=512 memory experiment (jobs 030-040, which remated everything).

Whole-step budget: job 101 already records 82.73 GB / 95.3% HBM-SoL at
106.0 ms (bytes floor 101.0 ms) — printed here against the measured
arms for the PERF_NOTES close-out.
"""
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig


def measure(tag, remat=None):
    m = models.build("resnet", depth=50,
                     **({"remat": remat} if remat else {}))
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((256,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)
    cost = step.lower(p, s, o, x, y, hp, r).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    bts = float(cost.get("bytes accessed", 0.0))
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    for _ in range(2):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(12):
            p, s, o, mt = step(p, s, o, x, y, hp, r)
        float(mt["loss"])
        dt = (time.perf_counter() - t0) / 12 * 1e3
        best = dt if best is None else min(best, dt)
    log(f"{tag}: {best:.2f} ms ({256/best*1e3:.0f} img/s), "
        f"bytes {bts/1e9:.2f} GB, floor {bts/1e9/819*1e3:.1f} ms, "
        f"%HBM {bts/1e9/819/(best/1e3)*100:.1f}%")
    return best


base = measure("baseline")

# (a) bf16 BN batch-moment reductions
import convnet_tpu.ops.norm as norm_mod

orig = norm_mod._batch_moments


def bf16_moments(x, axis_name, spatial_axis=None):
    x16 = x.astype(jnp.bfloat16)
    reduce_axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x16, axis=reduce_axes, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x16).astype(jnp.float32),
                       axis=reduce_axes)
    if spatial_axis is not None:
        from convnet_tpu.parallel.spatial import pmean_paired
        mean = pmean_paired(mean, spatial_axis)
        mean_sq = pmean_paired(mean_sq, spatial_axis)
    if axis_name is not None:
        from jax import lax
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, var


norm_mod._batch_moments = bf16_moments
try:
    measure("bf16-bn-stats")
finally:
    norm_mod._batch_moments = orig

# (b) remat layer1 / layer1+2 at B=256 (bandwidth angle)
for rm in (["layer1"], ["layer1", "layer2"]):
    try:
        measure(f"remat-{'+'.join(rm)}", remat=rm)
    except Exception as e:
        log(f"remat {rm}: FAILED {type(e).__name__}: {str(e)[:200]}")
