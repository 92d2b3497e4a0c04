# Job 060: on-chip inference/serving benchmark.
# RN50 + MobileNet-V2 bf16 through the REAL serving path
# (convnet_tpu.serve.Predictor._forward: uint8 -> /255 -> normalize ->
# model), device-resident inputs (relay transfer measured separately),
# absorb-BN A/B, batch sweep for latency/throughput.
import time

from convnet_tpu.serve import Predictor

RESULTS = []


def bench_model(name, config, batches, res):
    for absorb in (True, False):
        pred = Predictor(name, model_config=config, dtype="bf16",
                         batch_size=max(batches), absorb_bn=absorb)
        for b in batches:
            x = np.random.randint(0, 256, (b, res, res, 3), np.uint8)
            x_dev = jax.device_put(jnp.asarray(x))
            # compile once per shape
            fetch1(pred._forward(pred.params, pred.state, x_dev))
            k = 50 if b <= 32 else 20
            t0 = time.perf_counter()
            for _ in range(k):
                out = pred._forward(pred.params, pred.state, x_dev)
            fetch1(out)
            ms = (time.perf_counter() - t0) / k * 1e3
            ips = b / ms * 1e3
            log(f"{name} absorb={absorb} B={b}: {ms:.3f} ms "
                f"({ips:,.0f} img/s)")
            RESULTS.append((name, absorb, b, ms, ips))


bench_model("resnet", {"depth": 50}, [1, 8, 32, 128, 256], 224)
bench_model("mobilenet_v2", {}, [1, 256], 224)

# Host->device relay cost for one uint8 B=256 batch (NOT representative
# of a production host NIC/PCIe -- this box talks to the chip over a
# ~67 MB/s relay; recorded for honesty, excluded from img/s above).
x = np.random.randint(0, 256, (256, 224, 224, 3), np.uint8)
t0 = time.perf_counter()
xd = jax.device_put(jnp.asarray(x))
fetch1(xd.ravel()[0].astype(jnp.int32))
log(f"uint8 B=256 host->device transfer: "
    f"{(time.perf_counter() - t0) * 1e3:.0f} ms ({x.nbytes / 1e6:.1f} MB)")
