"""Session 13: sustained multi-epoch training on TPU — optimization
stability, regime transitions, checkpointing under real hardware."""
import sys, time, json
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_validate_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.data.data_regime import DataRegime

model = models.build("resnet", dataset="cifar10", depth=20)
regime = [
    {"epoch": 0, "optimizer": "SGD", "lr": 0.05, "momentum": 0.9,
     "regularizer": {"name": "WeightDecay", "value": 1e-4}},
    {"epoch": 12, "lr": 5e-3},
    {"epoch": 22, "lr": 5e-4},
]
tr = Trainer(model, OptimRegime(regime), 10,
             TrainerConfig(dtype="bf16", print_freq=0), seed=0)
p, s = model.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
data = DataRegime(defaults={"name": "synthetic", "batch_size": 256,
                            "augment": False,
                            "dataset_kwargs": {"size": 4096}})
t0 = time.perf_counter()
accs = []
for epoch in range(30):
    data.set_epoch(0)  # fixed data → memorization test
    p, s, o, res = tr.train_epoch(data.get_loader(), p, s, o, epoch)
    accs.append(res["prec1"])
    if epoch % 5 == 4 or epoch in (12, 22):
        log(f"epoch {epoch}: loss {res['loss']:.4f} "
            f"train prec1 {res['prec1']:.1f}% lr "
            f"{tr.optim.hyperparams()['lr']:.4g}")
wall = time.perf_counter() - t0
log(f"30 epochs (480 steps) wall {wall:.0f}s; final train prec1 "
    f"{accs[-1]:.1f}% (memorization target >95%)")
assert accs[-1] > 95.0, accs[-1]
assert np.isfinite(accs).all()
log("SUSTAINED TRAINING VALIDATION PASS")
OUT.close()
