"""Session 23: on-chip validation of the reduce_window-primal max-pool.

Covers the two measured erratum contexts (scripts/PERF_NOTES.md session
22): (a) fp32 conv->pool3/2/1->conv chain at small pooled sizes, (b)
the bf16 GoogLeNet stem at pool-out 56^2 — plus gradient parity of the
new VJP-forward (reduce_window + compare-to-max index) against the CPU
backend at the same shapes.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from convnet_tpu import ops

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print("devices:", cpu, tpu)


def chain(x, w7, w3, dtype):
    # fp32 cases pin HIGHEST precision: TPU convs otherwise run bf16
    # MXU passes, which both loosens tolerances and flips max-pool
    # argmax winners near ties (routing gradients differently than the
    # fp32 CPU reference — precision skew, not the erratum).
    prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    h = jax.lax.conv_general_dilated(
        x.astype(dtype), w7.astype(dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    h = ops.max_pool2d(h, 3, 2, 1)
    return jax.lax.conv_general_dilated(
        h, w3.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


rng = np.random.default_rng(3)
ok = True
for size, cin, cmid, cout, dtype in [
        (32, 3, 16, 24, jnp.float32),     # fp32 small-chain erratum repro
        (64, 3, 16, 24, jnp.float32),
        (224, 3, 64, 192, jnp.bfloat16),  # GoogLeNet stem (pool out 56^2)
]:
    x = rng.standard_normal((4, size, size, cin)).astype(np.float32)
    w7 = (rng.standard_normal((7, 7, cin, cmid)) * 0.05).astype(np.float32)
    w3 = (rng.standard_normal((3, 3, cmid, cout)) * 0.05).astype(np.float32)

    def loss(x_, w7_, w3_):
        return jnp.sum(chain(x_, w7_, w3_, dtype).astype(jnp.float32) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    outs = {}
    for name, dev in (("cpu", cpu), ("tpu", tpu)):
        args = [jax.device_put(jnp.asarray(a), dev) for a in (x, w7, w3)]
        with jax.default_device(dev):
            v, g = f(*args)
        outs[name] = (np.asarray(v), [np.asarray(gi) for gi in g])
    v_c, g_c = outs["cpu"]
    v_t, g_t = outs["tpu"]
    fin = np.isfinite(v_t) and all(np.isfinite(gi).all() for gi in g_t)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    rel = abs(v_t - v_c) / max(abs(v_c), 1e-9)
    grel = max(
        np.abs(gt - gc).max() / max(np.abs(gc).max(), 1e-9)
        for gt, gc in zip(g_t, g_c))
    good = fin and rel < tol and grel < (1e-3 if dtype == jnp.float32 else 0.1)
    ok &= good
    print(f"size={size} dtype={np.dtype(dtype).name}: finite={fin} "
          f"loss_rel={rel:.2e} grad_rel={grel:.2e} -> "
          f"{'OK' if good else 'FAIL'}")

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
