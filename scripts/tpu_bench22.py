"""Session 22: GoogLeNet@224 after the small-pool fusion barrier.

HARNESS BUG (found session 23): the timed loop below fetches the loss
every iteration — each fetch is a ~25 ms relay round-trip, so the
step times this script prints are inflated by ~25 ms. Kept for the
record; use the session-15/19 harness (k dispatches, one fetch).

The barrier (ops/pool.py _needs_fusion_barrier) now applies to every
pool with output <=32 on TPU backends — which on GoogLeNet@224 is the
second stem pool (28), pool3 (14), pool4 (7) and all nine inception
b4_pools (28/14/7). This measures the train-step cost vs the session-19
zoo number (97.6 ms / 2620 img/s) and checks output finiteness, which
session 19 never did.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import get_policy
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

B = 256
model = models.build("googlenet")
policy = get_policy("bf16")
optim = OptimRegime(model.regime)
tr = Trainer(model, optim, 1000, TrainerConfig(dtype="bf16", print_freq=0))
params, state = model.init(jax.random.PRNGKey(0), policy)
params, state, opt_state = tr.initialize(params, state)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
y = jnp.asarray(rng.integers(0, 1000, B).astype(np.int32))
optim.update(0, 0)
hp = tr._hp_device(optim.hyperparams())
step = tr._get_train_step()
k = jax.random.PRNGKey(1)

params, state, opt_state, m = step(params, state, opt_state, x, y, hp, k)
print("warmup loss:", float(m["loss"]), "grad_norm:", float(m["grad_norm"]))
times = []
for i in range(12):
    t0 = time.perf_counter()
    params, state, opt_state, m = step(params, state, opt_state, x, y, hp, k)
    _ = float(m["loss"])  # fetch closes the window
    times.append(time.perf_counter() - t0)
p50 = float(np.median(times))
print(f"train step p50 {p50*1e3:.1f} ms  {B/p50:.0f} img/s "
      f"(session 19: 97.6 ms / 2620 img/s)")
print("loss finite:", np.isfinite(float(m["loss"])),
      "grad_norm finite:", np.isfinite(float(m["grad_norm"])))

# eval finiteness at 224 (the path that NaN'd at 32)
ctx = Context(train=False, policy=policy)
logits = jax.jit(lambda p, s, x: model(p, s, policy.cast_to_compute(x),
                                          ctx)[0])(params, state, x[:64])
a = np.asarray(logits.astype(jnp.float32))
print("eval logits finite:", bool(np.isfinite(a).all()))
