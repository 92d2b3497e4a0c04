"""Job 116 (round 4): model-level serving A/B for the fused-MBConv
eval path (CONVNET_TPU_FUSED_MBCONV=1 routes stride-1 blocks with
256<=hidden<=640 through ops/pallas/mbconv.py). MobileNet-V2 B=256
bf16 uint8 serving forward, fused vs XLA."""
import os

import numpy as np_

from convnet_tpu.serve import Predictor


def bench(flag):
    os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
    if flag:
        os.environ["CONVNET_TPU_FUSED_MBCONV"] = "1"
    # fresh modules are handled by the worker per-job; within the job,
    # the flag is read at trace time -> rebuild the Predictor
    from convnet_tpu import models
    model = models.build("mobilenet_v2")
    pred = Predictor(model=model, dtype="bf16", dataset="imagenet")
    x = jnp.asarray(
        np_.random.default_rng(0).integers(0, 256, (256, 224, 224, 3),
                                           dtype=np_.uint8))
    logits = pred.predict(x)
    t = timeit(lambda: pred.predict(x), k=20)
    return t, logits


t_xla, l_xla = bench(False)
t_fused, l_fused = bench(True)
err = float(jnp.max(jnp.abs(l_xla.astype(jnp.float32)
                            - l_fused.astype(jnp.float32))))
os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
log(f"MNv2 serving B=256: xla {t_xla:.3f} ms ({256/t_xla*1e3:.0f} img/s) "
    f"vs fused {t_fused:.3f} ms ({256/t_fused*1e3:.0f} img/s) "
    f"= {t_xla/t_fused:.2f}x  max|dlogit| {err:.4f}")
