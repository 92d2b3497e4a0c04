"""Job 140 (round 5): Pallas grouped-conv v2 — fgc-wgrad backward.

Job 137 measured the v1 kernel (diag-dots dw): fwd WINS at (56,128,1)
1.20x and (7,1024,1) 1.29x, but fwd+bwd loses everywhere except 7^2
because job 136 showed the diag-dots wgrad is 0.23-0.56x (it pays T x
the grouped wgrad FLOPs). v2 keeps the pallas fwd + pallas stride-1 dx
and delegates dw to XLA's native fgc wgrad (whose lowering lacks the
stride-31 fwd pathology). Measure fwd and fwd+bwd at every ResNeXt-50
grouped shape vs fgc; tiled-dense (job 134) included for the full
dispatch table. Also check compile health (the (56,256,2) Mosaic 500
from job 137 should now route dx+dw to XLA; fwd may still crash there).
"""
import time as _t

from convnet_tpu.ops.pallas import grouped as G

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

for H, C, g, s in SHAPES:
    cg = C // g
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, C),
                          jnp.float32) * 0.05

    def f_fgc(x, w):
        return G._fgc(x, w, (s, s), (1, 1), g)

    def f_pal(x, w):
        return G.grouped_conv_pallas(x, w, stride=s, padding=1, groups=g)

    def gsum(f):
        def h(x, w):
            y = f(x, w)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(h, argnums=(0, 1)))

    try:
        jf = jax.jit(f_fgc)
        jp = jax.jit(f_pal)
        y0, y1 = jf(x, w), jp(x, w)
        err_y = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                      - y1.astype(jnp.float32))))
        gf_, gp_ = gsum(f_fgc), gsum(f_pal)
        (dx0, dw0), (dx1, dw1) = gf_(x, w), gp_(x, w)
        err_dx = float(jnp.max(jnp.abs(dx0.astype(jnp.float32)
                                       - dx1.astype(jnp.float32))))
        rel_dw = float(jnp.max(jnp.abs(dw0 - dw1))
                       / (jnp.max(jnp.abs(dw0)) + 1e-9))

        def bench(fn, *a, k=30):
            fetch1(fn(*a))
            fetch1(fn(*a))
            ws = []
            for _ in range(3):
                t0 = _t.perf_counter()
                for _ in range(k):
                    out = fn(*a)
                fetch1(out)
                ws.append((_t.perf_counter() - t0) / k * 1e3)
            return sorted(ws)[1]

        tf, tp = bench(jf, x, w), bench(jp, x, w)
        tbf, tbp = bench(gf_, x, w), bench(gp_, x, w)
        log(f"H={H} C={C} s={s} (cg={cg}): fwd fgc {tf:.2f} pallas {tp:.2f}"
            f" ({tf/tp:.2f}x) | fwd+bwd fgc {tbf:.2f} pallas {tbp:.2f}"
            f" ({tbf/tbp:.2f}x) | err y {err_y:.4f} dx {err_dx:.4f}"
            f" dw-rel {rel_dw:.4f}")
    except Exception as e:
        log(f"H={H} C={C} s={s}: FAILED {type(e).__name__}: "
            + str(e)[:200])
    finally:
        G._make_op.cache_clear()
        G._build_fwd.cache_clear()
