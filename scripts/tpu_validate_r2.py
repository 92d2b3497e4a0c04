"""Round-2 on-chip validation: the round-2 code paths (scaled-loss
differentiation, bf16 pool backward) keep real optimization healthy.

1. RN20/CIFAR 30-epoch memorization WITH loss_scale=1024 — the whole
   run exercises the scale/unscale path; convergence must match the
   round-1 unscaled baseline (>95% memorization).
2. RN50 (has the max-pool whose backward is now bf16): 60-step
   memorization on a fixed 512-sample synthetic ImageNet batch — loss
   must drop monotonically-ish (pool gradient routing healthy at bf16).
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_validate_r2_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n", ); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig
from convnet_tpu.data.data_regime import DataRegime

# ---- 1. RN20 under loss_scale=1024 --------------------------------
model = models.build("resnet", dataset="cifar10", depth=20)
regime = [
    {"epoch": 0, "optimizer": "SGD", "lr": 0.05, "momentum": 0.9,
     "regularizer": {"name": "WeightDecay", "value": 1e-4}},
    {"epoch": 12, "lr": 5e-3},
    {"epoch": 22, "lr": 5e-4},
]
tr = Trainer(model, OptimRegime(regime), 10,
             TrainerConfig(dtype="bf16", print_freq=0, loss_scale=1024.0),
             seed=0)
p, s = model.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
data = DataRegime(defaults={"name": "synthetic", "batch_size": 256,
                            "augment": False,
                            "dataset_kwargs": {"size": 4096}})
t0 = time.perf_counter()
accs = []
for epoch in range(30):
    data.set_epoch(0)  # fixed data → memorization
    p, s, o, res = tr.train_epoch(data.get_loader(), p, s, o, epoch)
    accs.append(res["prec1"])
    if epoch % 5 == 4 or epoch in (12, 22):
        log(f"epoch {epoch}: loss {res['loss']:.4f} prec1 "
            f"{res['prec1']:.1f}% lr {tr.optim.hyperparams()['lr']:.4g}")
wall = time.perf_counter() - t0
log(f"RN20 @ loss_scale=1024: 30 epochs wall {wall:.0f}s; final prec1 "
    f"{accs[-1]:.1f}% (round-1 unscaled baseline: >95%)")
assert accs[-1] > 95.0, accs[-1]

# ---- 2. RN50 memorization (bf16 pool bwd in the loop) --------------
m50 = models.build("resnet", depth=50)
regime50 = [{"epoch": 0, "optimizer": "SGD", "lr": 0.02, "momentum": 0.9,
             "regularizer": {"name": "WeightDecay", "value": 1e-4}}]
tr50 = Trainer(m50, OptimRegime(regime50), 1000,
               TrainerConfig(dtype="bf16", print_freq=0), seed=0)
p, s = m50.init(jax.random.PRNGKey(0), tr50.policy)
p, s, o = tr50.initialize(p, s)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((256, 224, 224, 3)).astype(np.float32)).astype(jnp.bfloat16)
y = jnp.asarray(rng.integers(0, 1000, 256).astype(np.int32))
tr50.optim.update(0, 0)
hp = tr50._hp_device(tr50.optim.hyperparams())
step = tr50._get_train_step()
losses = []
for i in range(60):
    p, s, o, mt = step(p, s, o, x, y, hp, jax.random.PRNGKey(i))
    if i % 10 == 9:
        losses.append(float(mt["loss"]))
        log(f"RN50 step {i}: loss {losses[-1]:.4f}")
# 60 steps at lr 0.02 on 1000 classes: expect a steady,
# accelerating decrease (full memorization needs ~10x more steps)
assert losses[-1] < losses[0] * 0.75, losses
assert all(b < a for a, b in zip(losses, losses[1:])), losses
log(f"RN50 memorization loss {losses[0]:.3f} -> {losses[-1]:.3f}")
log("ROUND-2 ON-CHIP VALIDATION PASS")
OUT.close()
