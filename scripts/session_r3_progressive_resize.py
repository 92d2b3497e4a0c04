"""RN50 train-step throughput at progressive-resizing sizes (Mix&Match
data-regime story): run on the TPU chip; results go to PERF_NOTES.md.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/session_r3_progressive_resize.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("resnet", dataset="imagenet", depth=50)
optim = OptimRegime(list(m.regime))
tr = Trainer(m, optim, 1000, TrainerConfig(dtype="bf16"), mesh=None)
params, state = m.init(jax.random.PRNGKey(0), tr.policy)
params, state, opt = tr.initialize(params, state)
hp = tr._hp_device(optim.hyperparams())
step = tr._get_train_step()
rng = jax.random.PRNGKey(1)

for size in (160, 192, 224):
    x = jnp.asarray(np.random.default_rng(0).random((256, size, size, 3),
                                                    np.float32))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 1000, 256))
    p2, s2, o2 = jax.tree_util.tree_map(jnp.copy, (params, state, opt))
    p2, s2, o2, mets = step(p2, s2, o2, x, y, hp, rng)  # compile
    float(mets["loss"])
    times = []
    for k in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            p2, s2, o2, mets = step(p2, s2, o2, x, y, hp, rng)
        float(mets["loss"])
        times.append((time.perf_counter() - t0) / 10)
    dt = min(times)
    print(f"{size}x{size}: {dt*1e3:.2f} ms/step = {256/dt:,.0f} img/s")
