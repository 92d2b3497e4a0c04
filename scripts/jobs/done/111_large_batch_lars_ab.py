"""Job 111 (round 4): large-batch outcome evidence (VERDICT r3 #6).

Part A: ResNet-50 B=4096 bf16 on-chip via chunked accumulation
(chunk_batch=16) under the 'large_lars' warmup regime — BASELINE
configs[3] mechanics: step time, loss descent over 8 steps.

Part B: LARS-vs-SGD A/B at matched steps on the synthetic task —
ResNet-20, StructuredSyntheticDataset (8192 train / 2048 val,
noise=1.0), B=2048 (batch = 1/4 of the dataset — the large-batch
regime where plain SGD + linear scaling degrades). Both arms get
linear-scaled lr, 10-step warmup, polynomial decay, matched 80 steps.
Report final val accuracy + train loss for both, honestly.
"""
import numpy as np_
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.regimes import schedules
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.data.datasets import StructuredSyntheticDataset
from convnet_tpu.core.module import apply_module

# ---------- Part A: RN50 B=4096 chunked, large_lars regime ----------
B_GLOBAL, CHUNK = 4096, 16
m = models.build("resnet", depth=50, regime="large_lars",
                 batch_size=B_GLOBAL, epochs=90)
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0, chunk_batch=CHUNK))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
x = jax.random.normal(jax.random.PRNGKey(1), (B_GLOBAL, 224, 224, 3),
                      jnp.bfloat16) * 0.5
y = jax.random.randint(jax.random.PRNGKey(2), (B_GLOBAL,), 0, 1000)
step = tr._get_train_step()
r = jax.random.PRNGKey(3)
losses = []
t0 = None
for i in range(8):
    tr.optim.update(0, i)
    hp = tr._hp_device(tr.optim.hyperparams())
    p, s, o, mt = step(p, s, o, x, y, hp, r)
    losses.append(float(mt["loss"]))
    if i == 0:
        fetch1(mt["loss"])
        t0 = time.perf_counter()
log(f"RN50 B=4096 chunk=16 large_lars: "
    f"{(time.perf_counter()-t0)/7*1e3:.0f} ms/step, "
    f"losses {['%.3f' % l for l in losses]}")
log(f"  = {B_GLOBAL/((time.perf_counter()-t0)/7):.0f} img/s/chip at B=4k")
del p, s, o, step, tr, m, x, y

# ---------- Part B: LARS vs SGD at B=2048, matched steps ----------
train = StructuredSyntheticDataset(size=8192, image_size=32, classes=10,
                                   seed=3, noise=1.0)
val = StructuredSyntheticDataset(size=2048, image_size=32, classes=10,
                                 seed=4, noise=1.0)
xtr = jnp.asarray(train.data.astype(np_.float32) / 255.0, jnp.bfloat16)
ytr = jnp.asarray(train.labels.astype(np_.int32))
xva = jnp.asarray(val.data.astype(np_.float32) / 255.0, jnp.bfloat16)
yva = np_.asarray(val.labels)

B, STEPS = 2048, 80
scaled = 0.1 * B / 256  # 0.8


def run(arm):
    if arm == "LARS":
        regime = [{"epoch": 0, "optimizer": "LARS", "momentum": 0.9,
                   "weight_decay": 1e-4, "trust_coef": 0.001,
                   "lr": schedules.polynomial_lr(
                       7.4 * B / 4096, STEPS, power=2.0, warmup_steps=10)}]
    else:
        regime = [{"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                   "regularizer": {"name": "WeightDecay", "value": 1e-4},
                   "lr": schedules.polynomial_lr(
                       scaled, STEPS, power=2.0, warmup_steps=10)}]
    model = models.build("resnet", dataset="cifar10", depth=20)
    t = Trainer(model, OptimRegime(regime), 10,
                TrainerConfig(dtype="bf16", print_freq=0), seed=0)
    p, s = model.init(jax.random.PRNGKey(5), t.policy)
    p, s, o = t.initialize(p, s)
    step = t._get_train_step()
    order = jnp.asarray(np_.random.default_rng(0).permutation(8192))
    lo = 0
    last = None
    for i in range(STEPS):
        t.optim.update(0, i)
        hp = t._hp_device(t.optim.hyperparams())
        sel = jax.lax.dynamic_slice_in_dim(order, lo % 8192, B)
        lo += B
        bx = jnp.take(xtr, sel, axis=0)
        by = jnp.take(ytr, sel, axis=0)
        p, s, o, mt = step(p, s, o, bx, by, hp, jax.random.PRNGKey(100 + i))
        last = mt
    final_loss = float(last["loss"])
    accs = []
    for k in range(0, 2048, 512):
        logits, _ = apply_module(model, p, s, xva[k:k + 512], train=False)
        accs.append(np_.argmax(np_.asarray(logits), -1) == yva[k:k + 512])
    acc = float(np_.concatenate(accs).mean())
    log(f"{arm}: final train loss {final_loss:.4f}, val acc {acc:.4f}")
    return acc


acc_lars = run("LARS")
acc_sgd = run("SGD")
log(f"LARS-vs-SGD @ B=2048, {STEPS} matched steps: "
    f"LARS {acc_lars:.4f} vs SGD {acc_sgd:.4f} "
    f"({'LARS wins' if acc_lars > acc_sgd else 'SGD wins'} by "
    f"{abs(acc_lars-acc_sgd)*100:.2f} pts)")
