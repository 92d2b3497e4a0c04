"""Job 118 (round 4): redo of 116b with job-060's exact methodology +
controls (job 116b measured 4.5 s/call for BOTH arms — 600x off the
known 7.5 ms MNv2 serving forward; find out why, then A/B the fused
eval path)."""
import os
import time

from convnet_tpu.serve import Predictor

log(f"devices: {jax.devices()}")

x = np.random.randint(0, 256, (256, 224, 224, 3), np.uint8)
x_dev = jax.device_put(jnp.asarray(x))


def bench(name, config, flag):
    os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
    if flag:
        os.environ["CONVNET_TPU_FUSED_MBCONV"] = "1"
    pred = Predictor(name, model_config=config, dtype="bf16",
                     batch_size=256, absorb_bn=False)
    fetch1(pred._forward(pred.params, pred.state, x_dev))
    t0 = time.perf_counter()
    for _ in range(20):
        out = pred._forward(pred.params, pred.state, x_dev)
    fetch1(out)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    log(f"{name} fused={int(flag)}: {ms:.3f} ms ({256/ms*1e3:,.0f} img/s)")
    os.environ.pop("CONVNET_TPU_FUSED_MBCONV", None)
    return ms, pred._forward(pred.params, pred.state, x_dev)


bench("resnet", {"depth": 50}, False)          # control
t_x, l_x = bench("mobilenet_v2", {}, False)
t_f, l_f = bench("mobilenet_v2", {}, True)
err = float(jnp.max(jnp.abs(l_x - l_f)))
scale = float(jnp.max(jnp.abs(l_x))) or 1.0
log(f"MNv2 fused-vs-xla: {t_x/t_f:.2f}x  max|dlogit| {err:.4f} "
    f"(rel {err/scale:.4f})")
