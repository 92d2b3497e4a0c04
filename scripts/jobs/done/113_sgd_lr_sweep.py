"""Job 113 (round 4): fairness follow-up to job 111 — SGD lr sweep at
B=2048 so the LARS win can't be attributed to a mistuned SGD arm.
Same task/schedule/steps as job 111 part B; SGD at lr in
{0.8 (linear-scaled), 0.4, 0.2, 0.1} and momentum 0.9.
"""
import numpy as np_

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.regimes import schedules
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.data.datasets import StructuredSyntheticDataset
from convnet_tpu.core.module import apply_module

train = StructuredSyntheticDataset(size=8192, image_size=32, classes=10,
                                   seed=3, noise=1.0)
val = StructuredSyntheticDataset(size=2048, image_size=32, classes=10,
                                 seed=4, noise=1.0)
xtr = jnp.asarray(train.data.astype(np_.float32) / 255.0, jnp.bfloat16)
ytr = jnp.asarray(train.labels.astype(np_.int32))
xva = jnp.asarray(val.data.astype(np_.float32) / 255.0, jnp.bfloat16)
yva = np_.asarray(val.labels)

B, STEPS = 2048, 80

for lr in (0.8, 0.4, 0.2, 0.1):
    regime = [{"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
               "regularizer": {"name": "WeightDecay", "value": 1e-4},
               "lr": schedules.polynomial_lr(lr, STEPS, power=2.0,
                                             warmup_steps=10)}]
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
        p, s, o, last = step(p, s, o, jnp.take(xtr, sel, axis=0),
                             jnp.take(ytr, sel, axis=0), hp,
                             jax.random.PRNGKey(100 + i))
    accs = []
    for k in range(0, 2048, 512):
        logits, _ = apply_module(model, p, s, xva[k:k + 512], train=False)
        accs.append(np_.argmax(np_.asarray(logits), -1) == yva[k:k + 512])
    acc = float(np_.concatenate(accs).mean())
    log(f"SGD lr={lr}: final train loss {float(last['loss']):.4f}, "
        f"val acc {acc:.4f}")
