"""Job 024: sustained on-chip training through the NATIVE decode path.

ResNet-18 @112, batch 64, 12 epochs over the 2000-image synthetic JPEG
tar (20 classes), DataLoader fast path = C++ pread+libjpeg+RRC.
Validates the round-3 native pipeline inside real training dynamics:
loss must fall and train accuracy must climb well above chance (5%).
"""
import os
import time

for key in list(os.environ):
    if key.startswith('CONVNET_TPU_'):
        del os.environ[key]

import numpy as np

from convnet_tpu import models
from convnet_tpu.data.datasets import IndexedTarDataset
from convnet_tpu.data.loader import DataLoader
from convnet_tpu.data.preprocess import get_transform
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

ds = IndexedTarDataset("/tmp/synth_imagenet.tar")
tfm = get_transform("imagenet", input_size=112, augment=True)
assert tfm.native_spec is not None
dl = DataLoader(ds, batch_size=64, transform=tfm, shuffle=True,
                num_workers=8, device_transform=True)

regime = [{"epoch": 0, "optimizer": "SGD", "lr": 0.05, "momentum": 0.9,
           "regularizer": {"name": "WeightDecay", "value": 1e-4}},
          {"epoch": 8, "lr": 0.005}]
model = models.build("resnet", depth=18, num_classes=20)
tr = Trainer(model, OptimRegime(regime), 20,
             TrainerConfig(dtype="bf16", print_freq=0))
params, state = model.init(jax.random.PRNGKey(0), tr.policy)
params, state, opt_state = tr.initialize(params, state)
step = tr._get_train_step()

t0 = time.time()
for epoch in range(12):
    dl.set_epoch(epoch)
    tr.optim.update(epoch, epoch * len(dl))
    hp = tr._hp_device(tr.optim.hyperparams())
    tot, correct, loss_sum = 0, 0.0, 0.0
    for i, (x, y) in enumerate(dl):
        params, state, opt_state, mt = step(
            params, state, opt_state, x, jnp.asarray(y), hp,
            jax.random.PRNGKey(epoch * 1000 + i))
        if i % 10 == 0:
            loss_sum = float(mt["loss"])
    log(f"epoch {epoch}: last loss {loss_sum:.4f} "
        f"({time.time()-t0:.0f}s elapsed)")

# train-set accuracy through the eval path (center-crop, native)
tfm_e = get_transform("imagenet", input_size=112, augment=False)
dle = DataLoader(ds, batch_size=64, transform=tfm_e, shuffle=False,
                 num_workers=8, device_transform=True, drop_last=False)
from convnet_tpu.core.module import apply_module
correct = 0
total = 0
for x, y in dle:
    logits, _ = apply_module(model, params, state, x, train=False)
    correct += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y)))
    total += len(y)
log(f"final train-set accuracy (eval path): {correct/total*100:.1f}% "
    f"({correct}/{total}; chance 5%)")
