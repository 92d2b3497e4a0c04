"""Session 14: ALL reference training features simultaneously, on-chip."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_validate_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"[features] sanity {float(jnp.ones((2,2)).sum())}")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.data.data_regime import DataRegime

model = models.build("resnet", dataset="cifar10", depth=20)
regime = [{"epoch": 0, "optimizer": "SGD", "lr": 0.02, "momentum": 0.9,
           "regularizer": {"name": "WeightDecay", "value": 1e-4}}]
tr = Trainer(model, OptimRegime(regime), 10,
             TrainerConfig(dtype="bf16", print_freq=0,
                           mixup_alpha=0.2, label_smoothing=0.1,
                           chunk_batch=2, duplicates=2,
                           adapt_grad_norm=10, grad_clip=5.0,
                           average_output=True), seed=0)
p, s = model.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
data = DataRegime(defaults={"name": "synthetic", "batch_size": 64,
                            "duplicates": 2,
                            "cutout": {"length": 8},
                            "dataset_kwargs": {"size": 2048}})
val = DataRegime(defaults={"name": "synthetic", "split": "val",
                           "duplicates": 2, "batch_size": 64,
                           "dataset_kwargs": {"size": 512}})
losses = []
for epoch in range(10):
    data.set_epoch(0)
    p, s, o, res = tr.train_epoch(data.get_loader(), p, s, o, epoch)
    losses.append(res["loss"])
vres = tr.validate(val.get_loader(), p, s)
log(f"[features] losses {['%.3f' % l for l in losses[::3]]} → "
    f"{losses[-1]:.3f}; TTA eval loss {vres['loss']:.3f} "
    f"prec1 {vres['prec1']:.1f}%")
assert np.isfinite(losses).all() and losses[-1] < losses[0]
assert float(o["agn_scale"]) > 0
log("[features] ALL-FEATURES (mixup+smooth+cutout+duplicates+agn+chunk"
    "+clip+wd+bf16+TTA) VALIDATION PASS")
OUT.close()
