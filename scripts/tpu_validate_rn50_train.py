"""Session 29: sustained-training validation at flagship scale.

ResNet-50, bf16, B=256, fixed 2048-sample synthetic ImageNet-sized set
(memorization target), ~200 steps on the v5e chip: loss must fall
monotonically (windowed) and finish well below the 6.9 random-1000-way
floor, with finite grad norms throughout — validates the full
optimization stack (pad-sum pooling VJPs included) end-to-end at
depth-50 scale, the round-1 session-13 protocol at 2.5× the depth.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_validate_rn50_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"29 sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("resnet", depth=50)
tr = Trainer(m, OptimRegime([{"epoch": 0, "optimizer": "SGD", "lr": 0.1,
                              "momentum": 0.9}]), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)

# Device-resident fixed set: shipping batches per-step over the ~67
# MB/s relay costs ~2 s/step (measured, first version of this script);
# 1024 bf16 images (308 MB) live in HBM and batches are gathered
# on-device.
rng = np.random.default_rng(0)
N = 1024
data = jnp.asarray(rng.standard_normal((N, 224, 224, 3)),
                   dtype=jnp.bfloat16)
labels = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
take = jax.jit(lambda d, l, i: (jnp.take(d, i, axis=0), jnp.take(l, i)))
key = jax.random.PRNGKey(1)

STEPS = 800
B = 256
losses = []
t0 = time.perf_counter()
for i in range(STEPS):
    idx = jnp.asarray(rng.integers(0, N, B))
    x, y = take(data, labels, idx)
    key, k = jax.random.split(key)
    p, s, o, mt = step(p, s, o, x, y, hp, k)
    if i % 40 == 0 or i == STEPS - 1:
        l, g = float(mt["loss"]), float(mt["grad_norm"])
        losses.append(l)
        log(f"step {i:3d}: loss {l:.4f} grad_norm {g:.2f}")
        assert np.isfinite(l) and np.isfinite(g), "non-finite!"
wall = time.perf_counter() - t0
log(f"wall {wall:.0f}s ({STEPS*B/wall:.0f} img/s)")
# memorization of 1024 random-labeled samples: the loss must fall
# decisively below the ln(1000)=6.9 random floor and keep falling
# across the back half of the run
half = len(losses) // 2
log(f"loss {losses[0]:.3f} -> {losses[-1]:.3f} "
    f"(mid {losses[half]:.3f})")
ok = (losses[-1] < 4.0 and losses[-1] < losses[half] - 0.3
      and all(np.isfinite(losses)))
log("RN50 SUSTAINED TRAINING OK" if ok else "RN50 VALIDATION FAILED")
OUT.close()
sys.exit(0 if ok else 1)
