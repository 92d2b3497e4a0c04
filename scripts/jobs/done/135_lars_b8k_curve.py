"""Job 135 (round 5, VERDICT r4 #7): large-batch evidence at the
flagship operating point — ResNet-50 + LARS at B=8192 on-chip via
chunked accumulation (32x256), loss curve vs the B=256 SGD
equivalent-epoch curve on the same learnable task.

Task: StructuredSyntheticDataset semantics at 224^2/100 classes, but
generated ON DEVICE per batch (prototype gather + per-sample-index
noise) so neither arm ships batches over the ~67 MB/s relay. Both arms
see the identical sample universe (noise keyed by sample index); val
split uses disjoint indices. 50 equivalent epochs over a 16384-sample
universe: LARS B=8192 -> 100 steps; SGD B=256 -> 3200 steps.
"""
import time

import numpy as np_

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.regimes import schedules
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.core.module import apply_module

CLASSES, IMG, N, NOISE = 100, 224, 16384, 1.0
EPOCHS = 50

# class prototypes: low-res smooth patterns, upsampled (datasets.py:70)
prng = np_.random.default_rng(1234)
cells = IMG // 8
low = prng.uniform(0.15, 0.85, (CLASSES, cells, cells, 3))
protos_np = np_.stack([
    np_.kron(l, np_.ones((8, 8, 1)))[:IMG, :IMG] for l in low])
protos = jnp.asarray(protos_np, jnp.float32)          # (100,224,224,3)

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


def run(arm, B, steps, chunk):
    spe = N // B                               # steps per equivalent epoch
    if arm == "LARS":
        regime = [{"epoch": 0, "optimizer": "LARS", "momentum": 0.9,
                   "weight_decay": 1e-4, "trust_coef": 0.001,
                   "lr": schedules.polynomial_lr(
                       7.4 * B / 4096, steps, power=2.0,
                       warmup_steps=max(steps // 10, 5 * spe))}]
    else:
        regime = [{"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                   "regularizer": {"name": "WeightDecay", "value": 1e-4},
                   "lr": schedules.polynomial_lr(
                       0.1 * B / 256, steps, power=2.0,
                       warmup_steps=max(steps // 10, 5 * spe))}]
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
        if (i + 1) % spe == 0:                 # equivalent-epoch boundary
            curve.append(float(mt["loss"]))
        if i == 0:
            fetch1(mt["loss"])
            t0 = time.perf_counter()
            k0 = 1
    dt = (time.perf_counter() - t0) / (steps - k0) * 1e3
    # held-out accuracy: disjoint noise indices (N + j)
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
    ep_marks = [1, 2, 5, 10, 20, 30, 40, 50]
    log(f"{arm} B={B} loss at epochs {ep_marks}: "
        + " ".join(f"{curve[e-1]:.3f}" for e in ep_marks if e <= len(curve)))
    return curve, acc


curve_l, acc_l = run("LARS", 8192, EPOCHS * (N // 8192), chunk=32)
curve_s, acc_s = run("SGD", 256, EPOCHS * (N // 256), chunk=0)
log(f"SUMMARY: LARS@8192 val {acc_l:.4f} vs SGD@256 val {acc_s:.4f} "
    f"(gap {(acc_l-acc_s)*100:+.2f} pts over {EPOCHS} equivalent epochs)")
