"""Job 051: on-chip generalization run with the final round-3 code:
ResNet-20 on StructuredSyntheticDataset (5000 train / 1000 held-out),
30 epochs, device-resident batching, the CIFAR regime's lr schedule.
Validates optimization dynamics + eval path end-to-end on hardware
(stronger than the round-1 memorization run: val accuracy measures
true generalization through augmentation + BN + eval path)."""
import os
for key in list(os.environ):
    if key.startswith("CONVNET_TPU_"):
        del os.environ[key]
import time

import numpy as np

from convnet_tpu import models
from convnet_tpu.data.datasets import StructuredSyntheticDataset
from convnet_tpu.data.loader import ArrayBatcher
from convnet_tpu.data.preprocess import get_transform
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

train = StructuredSyntheticDataset(size=5000, image_size=32, classes=10,
                                   seed=1)
val = StructuredSyntheticDataset(size=1000, image_size=32, classes=10,
                                 seed=2)
tfm = get_transform("cifar10", augment=True)
tfm_e = get_transform("cifar10", augment=False)
dl = ArrayBatcher(train, tfm, batch_size=128, shuffle=True)
dle = ArrayBatcher(val, tfm_e, batch_size=128, shuffle=False,
                   drop_last=False)

model = models.build("resnet", dataset="cifar10", depth=20)
tr = Trainer(model, OptimRegime(model.regime), 10,
             TrainerConfig(dtype="bf16", print_freq=0))
params, state = model.init(jax.random.PRNGKey(0), tr.policy)
params, state, opt_state = tr.initialize(params, state)
step = tr._get_train_step()

t0 = time.time()
for epoch in range(30):
    dl.set_epoch(epoch)
    tr.optim.update(epoch, epoch * len(dl))
    hp = tr._hp_device(tr.optim.hyperparams())
    for i, (x, y) in enumerate(dl):
        params, state, opt_state, mt = step(
            params, state, opt_state, x, jnp.asarray(y), hp,
            jax.random.PRNGKey(epoch * 1000 + i))
    if epoch % 10 == 9 or epoch == 0:
        res = tr.validate(dle, params, state)
        log(f"epoch {epoch}: val prec1 {res['prec1']:.2f} "
            f"loss {res['loss']:.4f} lr {tr.optim.hyperparams()['lr']:.3g} "
            f"({time.time()-t0:.0f}s)")
res = tr.validate(dle, params, state)
log(f"FINAL held-out accuracy: {res['prec1']:.2f}% (chance 10%)")
