"""Job 143 (round 5, VERDICT r4 #7 redo): large-batch evidence at the
flagship operating point, on a NON-saturating task this time.

Job 135's 16384-sample universe saturated both arms (val 1.0000, loss
0.000 by epoch 20) and gave the B=8192 arm only 2 steps/equivalent-
epoch — unrepresentatively few (real ImageNet B=8192 is 156 st/ep).
Redo with a 65536-sample universe (8 st/ep at B=8192), noise 2.0, and
only 20 equivalent epochs so the curves are read mid-descent.

Three arms, identical sample universe + schedule family (poly-2 decay,
5-equivalent-epoch warmup):
  - SGD  B=256   lr 0.1            — the reference operating point
  - SGD  B=8192  lr 0.1*B/256=3.2  — linear-scaling rule past its ~8k
                                     ceiling (expected: unstable/worse)
  - LARS B=8192  lr 7.4*B/4096     — the flagship `large_lars` regime
Claim under test (examples/resnet50_lars_b16k.sh, SURVEY §6): LARS
holds the equivalent-epoch trajectory where plain scaled SGD breaks.

Bonus: 3-step B=16384 (chunk 64) feasibility probe — the example's
advertised batch on ONE chip — recording step time + img/s.
"""
import time

import numpy as np_

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.regimes import schedules
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.core.module import apply_module

CLASSES, IMG, N, NOISE = 100, 224, 65536, 2.0
EPOCHS = 20

prng = np_.random.default_rng(1234)
cells = IMG // 8
low = prng.uniform(0.15, 0.85, (CLASSES, cells, cells, 3))
protos_np = np_.stack([
    np_.kron(l, np_.ones((8, 8, 1)))[:IMG, :IMG] for l in low])
protos = jnp.asarray(protos_np, jnp.float32)

labels_tr = jnp.asarray(np_.random.default_rng(7).integers(0, CLASSES, N))
labels_va = jnp.asarray(np_.random.default_rng(8).integers(0, CLASSES, 2048))
KEY0 = jax.random.PRNGKey(42)


def _noise1(idx):
    return jax.random.normal(jax.random.fold_in(KEY0, idx),
                             (IMG, IMG, 3), jnp.bfloat16) * NOISE


@jax.jit
def make_batch(labels, idxs):
    x = protos[labels].astype(jnp.bfloat16) + jax.vmap(_noise1)(idxs)
    return jnp.clip(x, 0.0, 1.0) - 0.45


def run(arm, B, chunk, steps_cap=None):
    spe = N // B
    steps = steps_cap or EPOCHS * spe
    warm = 5 * spe
    if arm == "LARS":
        regime = [{"epoch": 0, "optimizer": "LARS", "momentum": 0.9,
                   "weight_decay": 1e-4, "trust_coef": 0.001,
                   "lr": schedules.polynomial_lr(
                       7.4 * B / 4096, steps, power=2.0,
                       warmup_steps=warm)}]
    else:
        regime = [{"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                   "regularizer": {"name": "WeightDecay", "value": 1e-4},
                   "lr": schedules.polynomial_lr(
                       0.1 * B / 256, steps, power=2.0,
                       warmup_steps=warm)}]
    m = models.build("resnet", depth=50, num_classes=CLASSES)
    tr = Trainer(m, OptimRegime(regime), CLASSES,
                 TrainerConfig(dtype="bf16", print_freq=0,
                               chunk_batch=chunk), seed=0)
    p, s = m.init(jax.random.PRNGKey(5), tr.policy)
    p, s, o = tr.initialize(p, s)
    step = tr._get_train_step()
    order = jnp.asarray(np_.random.default_rng(0).permutation(N))
    curve = []
    t0 = None
    k0 = 0
    for i in range(steps):
        tr.optim.update(i // spe, i)
        hp = tr._hp_device(tr.optim.hyperparams())
        sel = jax.lax.dynamic_slice_in_dim(order, (i * B) % N, B)
        bx = make_batch(labels_tr[sel], sel)
        by = labels_tr[sel].astype(jnp.int32)
        p, s, o, mt = step(p, s, o, bx, by, hp, jax.random.PRNGKey(100 + i))
        if (i + 1) % spe == 0:
            curve.append(float(mt["loss"]))
        if i == 0:
            fetch1(mt["loss"])
            t0 = time.perf_counter()
            k0 = 1
    dt = (time.perf_counter() - t0) / max(steps - k0, 1) * 1e3
    if steps_cap:                      # feasibility probe: no curve/val
        log(f"{arm} B={B} (probe, {steps} steps): {dt:.0f} ms/step "
            f"({B/dt*1e3:.0f} img/s)")
        return None, None
    accs = []
    for k in range(0, 2048, 256):
        xv = make_batch(labels_va[k:k + 256],
                        jnp.arange(N + k, N + k + 256))
        logits, _ = apply_module(m, p, s, xv, train=False)
        accs.append(np_.argmax(np_.asarray(logits), -1)
                    == np_.asarray(labels_va[k:k + 256]))
    acc = float(np_.concatenate(accs).mean())
    log(f"{arm} B={B}: {dt:.0f} ms/step ({B/dt*1e3:.0f} img/s), "
        f"val top-1 {acc:.4f}")
    marks = [1, 2, 5, 10, 15, 20]
    log(f"{arm} B={B} loss at epochs {marks}: "
        + " ".join(f"{curve[e-1]:.3f}" for e in marks if e <= len(curve)))
    return curve, acc


curve_s, acc_s = run("SGD", 256, 0)
curve_lin, acc_lin = run("SGD", 8192, 32)
curve_l, acc_l = run("LARS", 8192, 32)
log(f"SUMMARY: SGD@256 val {acc_s:.4f} | SGD-linear@8192 val "
    f"{acc_lin:.4f} | LARS@8192 val {acc_l:.4f}")
log("equivalent-epoch final losses: "
    f"SGD@256 {curve_s[-1]:.3f} | SGD-lin@8192 {curve_lin[-1]:.3f} | "
    f"LARS@8192 {curve_l[-1]:.3f}")
run("LARS", 16384, 64, steps_cap=3)
