"""Job 137 (round 5): Pallas grouped-conv kernel (ops/pallas/grouped.py)
vs the fgc lowering at every ResNeXt-50 grouped shape, fwd-only and
fwd+bwd, bf16 B=256. Also verifies fp32-relative parity of y/dx/dw on
hardware. The kernel keeps channels on lanes in 128-wide tiles (no
Mosaic lane-split), dense block-diag MXU taps, one padded image per
program.
"""
from jax import lax

from convnet_tpu.ops.pallas.grouped import grouped_conv_pallas

B = 256
SHAPES = [
    (56, 128, 32, 1),
    (56, 256, 32, 2),
    (28, 256, 32, 1),
    (28, 512, 32, 2),
    (14, 512, 32, 1),
    (14, 1024, 32, 2),
    (7, 1024, 32, 1),
]
DIMS = ("NHWC", "HWIO", "NHWC")

for H, C, g, s in SHAPES:
    cg = C // g
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    wg = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, C),
                           jnp.bfloat16) * 0.05

    def f_pal(x, w):
        return jnp.sum(grouped_conv_pallas(
            x, w, stride=s, padding=1, groups=g).astype(jnp.float32) ** 2)

    def f_fgc(x, w):
        y = lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=g,
            dimension_numbers=DIMS)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    fwd_p = jax.jit(lambda x, w: grouped_conv_pallas(
        x, w, stride=s, padding=1, groups=g))
    fwd_f = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=g,
        dimension_numbers=DIMS))
    try:
        yp = fwd_p(x, wg)
    except Exception as e:  # noqa: BLE001
        log(f"H={H} C={C} s={s}: PALLAS FWD FAILED "
            f"{type(e).__name__}: {str(e)[:140]}")
        continue
    yf = fwd_f(x, wg)
    ey = float(jnp.max(jnp.abs(yp.astype(jnp.float32)
                               - yf.astype(jnp.float32))))
    gp = jax.jit(jax.grad(f_pal, argnums=(0, 1)))
    gf = jax.jit(jax.grad(f_fgc, argnums=(0, 1)))
    try:
        dxp, dwp = gp(x, wg)
    except Exception as e:  # noqa: BLE001
        log(f"H={H} C={C} s={s}: fwd OK (err {ey:.4f}) but BWD FAILED "
            f"{type(e).__name__}: {str(e)[:140]}")
        continue
    dxf, dwf = gf(x, wg)
    ex = float(jnp.max(jnp.abs(dxp.astype(jnp.float32)
                               - dxf.astype(jnp.float32))))
    a, b_ = dwp.astype(jnp.float32), dwf.astype(jnp.float32)
    ew = float(jnp.max(jnp.abs(a - b_) / (jnp.abs(b_) + 1.0)))
    tf_fwd = timeit(fwd_f, x, wg, k=10)
    tp_fwd = timeit(fwd_p, x, wg, k=10)
    tf_all = timeit(gf, x, wg, k=10)
    tp_all = timeit(gp, x, wg, k=10)
    log(f"H={H} C={C} s={s} (cg={cg},T={C//128}): "
        f"fwd fgc {tf_fwd:.2f} pallas {tp_fwd:.2f} ({tf_fwd/tp_fwd:.2f}x) | "
        f"fwd+bwd fgc {tf_all:.2f} pallas {tp_all:.2f} "
        f"({tf_all/tp_all:.2f}x) | err y {ey:.4f} dx {ex:.4f} dw-rel {ew:.4f}")
