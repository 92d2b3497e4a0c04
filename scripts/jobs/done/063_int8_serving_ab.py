# Job 063: model-level int8 PTQ serving A/B (new nn/quant.py path).
# Predictor bf16 vs quantize="int8" at B=256: RN50, MobileNet v1/v2.
import time

from convnet_tpu.serve import Predictor


def bench(pred, b, res, k=20):
    x = np.random.randint(0, 256, (b, res, res, 3), np.uint8)
    xd = jax.device_put(jnp.asarray(x))
    fetch1(pred._forward(pred.params, pred.state, xd))
    t0 = time.perf_counter()
    for _ in range(k):
        out = pred._forward(pred.params, pred.state, xd)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


for name, cfg in [("resnet", {"depth": 50}), ("mobilenet", {}),
                  ("mobilenet_v2", {})]:
    base = Predictor(name, model_config=cfg, dtype="bf16", batch_size=256)
    ms_f = bench(base, 256, 224)
    del base
    quant = Predictor(name, model_config=cfg, dtype="bf16", batch_size=256,
                      quantize="int8")
    ms_q = bench(quant, 256, 224)
    # sanity: logits still track (random-init net, same PRNGKey(0) params)
    x = np.random.randint(0, 256, (64, 224, 224, 3), np.uint8)
    base = Predictor(name, model_config=cfg, dtype="bf16", batch_size=64)
    lb = base.predict_logits(x)
    quant64 = Predictor(name, model_config=cfg, dtype="bf16", batch_size=64,
                        quantize="int8")
    lq = quant64.predict_logits(x)
    corr = float(np.corrcoef(lb.ravel(), lq.ravel())[0, 1])
    agree = float(np.mean(lb.argmax(-1) == lq.argmax(-1)))
    log(f"{name}: bf16 {ms_f:.3f} ms ({256 / ms_f * 1e3:,.0f} img/s) | "
        f"int8 {ms_q:.3f} ms ({256 / ms_q * 1e3:,.0f} img/s) | "
        f"{ms_f / ms_q:.2f}x | corr {corr:.4f} top1-agree {agree:.2f}")
    del quant, base, quant64
