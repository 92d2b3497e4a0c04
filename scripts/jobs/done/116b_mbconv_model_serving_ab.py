"""Job 116b (round 4): model-level serving A/B for the fused-MBConv
eval path (CONVNET_TPU_FUSED_MBCONV=1 routes stride-1 blocks with
256<=hidden<=640 through ops/pallas/mbconv.py). MobileNet-V2 B=256
bf16 uint8 serving forward, device-resident inputs (relay discipline),
fused vs XLA. Also RN50-control (no MBConv blocks -> must be equal).
"""
import os

import numpy as np_

from convnet_tpu.serve import Predictor

x = jnp.asarray(
    np_.random.default_rng(0).integers(0, 256, (256, 224, 224, 3),
                                       dtype=np_.uint8))


def bench(flag):
    os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
    if flag:
        os.environ["CONVNET_TPU_FUSED_MBCONV"] = "1"
    pred = Predictor("mobilenet_v2", dtype="bf16", batch_size=256,
                     absorb_bn=False)
    f = lambda: pred._forward(pred.params, pred.state, x)
    logits = f()
    t = timeit(f, k=20)
    return t, logits


t_xla, l_xla = bench(False)
t_fused, l_fused = bench(True)
err = float(jnp.max(jnp.abs(l_xla.astype(jnp.float32)
                            - l_fused.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(l_xla))) or 1.0
os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
log(f"MNv2 serving B=256: xla {t_xla:.3f} ms ({256/t_xla*1e3:.0f} img/s) "
    f"vs fused {t_fused:.3f} ms ({256/t_fused*1e3:.0f} img/s) "
    f"= {t_xla/t_fused:.2f}x  max|dlogit| {err:.4f} (rel {err/scale:.4f})")
