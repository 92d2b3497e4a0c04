"""Benchmark: ResNet-50 ImageNet-style training throughput (img/s/chip).

Prints ONE JSON line:
    {"metric": "resnet50_train_images_per_sec_per_chip", "value": N,
     "unit": "images/sec/chip", "vs_baseline": R, ...}

Baseline for ``vs_baseline``: the reference (eladhoffer/convNet.pytorch)
publishes no throughput numbers (BASELINE.md), so 410 img/s is an
EXTERNAL anchor, not a measured reference number: the round-1 estimate
of what the reference's torch-1.x stack sustains for fp16 ResNet-50
B256 on its documented hardware class (single V100, SURVEY.md §6 —
consistent with the widely reported 300-500 img/s range for
pre-channels-last torch AMP on that part; NVIDIA's tuned
DeepLearningExamples ResNet-50 v1.5 reports ~800 img/s, roughly 2x any
stock-torch-1.x run). Its provenance is therefore indicative only; the
BINDING target in BASELINE.md is "speed-of-light images/sec/chip", and
the fields that carry that story are ``mfu`` (fraction of the chip's
bf16 matmul peak) and ``hbm_sol`` (fraction of HBM bandwidth the step's
XLA-counted traffic sustains — the real ceiling for this traffic-bound
model, see docs/BENCHMARKS.md). ``vs_baseline_anchor`` restates this in
the JSON itself.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 410.0  # V100 fp16 ResNet-50 train (reference's HW class)


def main():
    from convnet_tpu import models
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    # Bench config: bf16 ResNet-50, global batch sized for one chip.
    batch = 256 if on_tpu else 16
    image = 224 if on_tpu else 64
    steps = 30 if on_tpu else 3

    model = models.build("resnet", depth=50)
    optim = OptimRegime(model.regime)
    trainer = Trainer(model, optim, num_classes=1000,
                      config=TrainerConfig(dtype="bf16", print_freq=0))
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, opt_state = trainer.initialize(params, state)

    x = jnp.ones((batch, image, image, 3), jnp.bfloat16)
    y = jnp.zeros((batch,), jnp.int32)
    optim.update(0, 0)
    hp = trainer._hp_device(optim.hyperparams())
    step_fn = trainer._get_train_step()
    rng = jax.random.PRNGKey(1)

    # compile + warmup. NOTE: on the axon backend block_until_ready is
    # lazy — only a host fetch truly synchronizes, so all timing windows
    # are closed by float() fetches.
    params, state, opt_state, m = step_fn(params, state, opt_state, x, y, hp, rng)
    float(m["loss"])
    for _ in range(3):
        params, state, opt_state, m = step_fn(params, state, opt_state, x, y, hp, rng)
    float(m["loss"])

    def timed_window(k):
        nonlocal params, state, opt_state
        t0 = time.perf_counter()
        for _ in range(k):
            params, state, opt_state, mm = step_fn(
                params, state, opt_state, x, y, hp, rng)
        float(mm["loss"])  # synchronize
        return (time.perf_counter() - t0) / k

    windows = sorted(timed_window(steps) for _ in range(3))
    p50 = windows[1]
    img_per_sec = batch / p50

    # --- MFU: distance to speed-of-light (BASELINE.md's binding
    # target), not only vs the V100 reference. Step FLOPs come from
    # XLA's own cost analysis of the compiled train step (forward +
    # backward + optimizer); fallback is the analytic ResNet-50 count
    # (~4.09 GFLOP/image forward x3 for training).
    step_flops = None
    step_bytes = None
    try:
        cost = (step_fn.lower(params, state, opt_state, x, y, hp, rng)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
        step_bytes = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        step_flops = None
    if not step_flops:
        # 4.09e9 is ResNet-50's forward MAC count; the peak table (and
        # XLA's cost analysis) count FMA as 2 FLOPs, and training is
        # ~3x the forward
        step_flops = 3 * 2 * 4.09e9 * batch * (image / 224) ** 2
    # bf16 matmul peak by device generation; unknown generations fall
    # back to the v5e figure and say so in the output
    kind = jax.devices()[0].device_kind.lower()
    # ordered substring match: the "lite" variants must precede the
    # bare "v5" fallback (libtpu reports v5e as "TPU v5 lite" but v5p
    # as plain "TPU v5" in some versions — a bare-"v5" kind is v5p)
    # one row per generation: (kind substring, bf16 peak FLOP/s,
    # HBM bandwidth B/s). HBM speed-of-light is the fraction of the
    # bandwidth the step's XLA-counted HBM traffic sustains — the
    # binding ceiling for traffic-bound models (jobs 010-013: RN50's
    # dominant backward fusions run at ~90% of it).
    peaks = [("v6e", 918e12, 1640e9), ("v6 lite", 918e12, 1640e9),
             ("v5 lite", 197e12, 819e9), ("v5e", 197e12, 819e9),
             ("v5p", 459e12, 2765e9), ("v5", 459e12, 2765e9),
             ("v4", 275e12, 1228e9), ("v3", 123e12, 900e9)]
    peak, hbm_bw = next(((f, b) for k, f, b in peaks if k in kind),
                        (None, None))
    peak_known = peak is not None
    if peak is None:
        peak, hbm_bw = 197e12, 819e9  # v5e figures as the fallback
    model_tflops = step_flops / p50 / 1e12

    result = {
        "metric": "resnet50_train_images_per_sec_per_chip",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
        "vs_baseline_anchor": ("external estimate: ~410 img/s fp16 RN50 "
                               "B256, stock torch-1.x on 1xV100 (ref pub"
                               "lishes none); binding target is mfu/"
                               "hbm_sol vs this chip's speed of light"),
        "step_time_p50_ms": round(p50 * 1e3, 2),
        "batch": batch,
        "image_size": image,
        "dtype": "bf16",
        "platform": platform,
        "step_gflops": round(step_flops / 1e9, 1),
        "model_tflops": round(model_tflops, 2),
        "mfu": round(model_tflops * 1e12 / peak, 4),
        "peak_tflops_assumed": peak / 1e12,
        "peak_known": peak_known,
        "device_kind": jax.devices()[0].device_kind,
    }
    if step_bytes:
        result["step_gbytes"] = round(step_bytes / 1e9, 2)
        result["hbm_gbps"] = round(step_bytes / p50 / 1e9, 1)
        result["hbm_sol"] = round(step_bytes / p50 / hbm_bw, 4)
        result["hbm_bw_assumed_gbps"] = hbm_bw / 1e9
    print(json.dumps(result))


if __name__ == "__main__":
    main()
