"""Job 110 (round 4): Pallas DMA rate vs block size / grid length, and
bisect the dwfold Mosaic 500.

Job 109: folded-layout copies run at ~120 GB/s regardless — suspect
per-grid-step latency without pipelining. If rate grows with block
size (fewer steps), the fused kernels must use multi-image blocks.
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, WPC = 256, 112, 3712
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, WPC), jnp.bfloat16)
GB = x.size * 2 * 2 / 1e9


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def run(name, bb, multiple_of=None, params=None):
    try:
        call = pl.pallas_call(
            k_copy, grid=(B // bb,),
            in_specs=[pl.BlockSpec((bb, H, WPC), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, H, WPC), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, WPC), jnp.bfloat16),
            **(params or {}))
        f = jax.jit(lambda a: call(a))
        f(x)
        t = timeit(f, x, k=20)
        log(f"{name}: {t:.3f} ms ({GB/t*1e3:.0f} GB/s)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


run("copy bb=1 grid(256)", 1)
run("copy bb=2 grid(128)", 2)
run("copy bb=4 grid(64)", 4)
run("copy bb=8 grid(32)", 8)

# dimension_semantics hint
try:
    cp = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",))
    run("copy bb=1 arbitrary", 1, params={"compiler_params": cp})
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel",))
    run("copy bb=1 parallel", 1, params={"compiler_params": cp})
except Exception as e:
    log(f"dimension_semantics: {type(e).__name__} {str(e)[:120]}")

# 2D giant blocks
x2 = x.reshape(B * H, WPC)


def run2d(name, rows):
    try:
        call = pl.pallas_call(
            k_copy, grid=((B * H) // rows,),
            in_specs=[pl.BlockSpec((rows, WPC), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, WPC), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, WPC), jnp.bfloat16))
        f = jax.jit(lambda a: call(a))
        f(x2)
        t = timeit(f, x2, k=20)
        log(f"{name}: {t:.3f} ms ({GB/t*1e3:.0f} GB/s)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


run2d("copy2d rows=448 grid(64)", 448)
run2d("copy2d rows=896 grid(32)", 896)

# XLA reference: the same logical copy outside Pallas
f_xla = jax.jit(lambda a: a * 2.0)
f_xla(x)
t = timeit(f_xla, x, k=20)
log(f"XLA copy x*2: {t:.3f} ms ({GB/t*1e3:.0f} GB/s)")

# ---- dwfold Mosaic-500 bisect (H padded to 8-multiple rows) ----
HP2, W, C = 120, 112, 32
WP = W + 4
x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
xf = jnp.pad(x4, ((0, 0), (1, 7), (1, 3), (0, 0))).reshape(B, HP2, WP * C)
wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32) * 0.2
wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WP * C)


def mk_dw(variant):
    def body(x_ref, w_ref, o_ref):
        v = x_ref[0].astype(jnp.float32)
        acc = None
        for di in range(3):
            rows = v[di:di + H, :]
            taps = range(1) if variant == "rowonly" else range(3)
            for dj in taps:
                if dj == 0:
                    shifted = rows
                elif variant == "roll":
                    shifted = pltpu.roll(rows, WP * C - dj * C, 1)
                else:
                    shifted = jnp.concatenate(
                        [rows[:, dj * C:],
                         jnp.zeros((H, dj * C), jnp.float32)], axis=1)
                t = shifted * w_ref[3 * di + dj][None, :]
                acc = t if acc is None else acc + t
        o_ref[0] = acc.astype(o_ref.dtype)
    return pl.pallas_call(
        body, grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HP2, WP * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, WP * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WP * C), jnp.bfloat16))


ref = jax.lax.conv_general_dilated(
    x4, wd9.reshape(3, 3, 1, C), (1, 1), ((1, 1), (1, 1)),
    feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
for variant in ("rowonly", "concat", "roll"):
    try:
        call = mk_dw(variant)
        f = jax.jit(lambda a, w: call(a, w))
        out = f(xf, wrows)
        t = timeit(f, xf, wrows, k=20)
        note = ""
        if variant != "rowonly":
            got = out.reshape(B, H, WP, C)[:, :, 0:W, :]
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            note = f"  maxerr {err:.5f}"
        log(f"dwfold[{variant}]: {t:.3f} ms{note}")
    except Exception as e:
        log(f"dwfold[{variant}]: FAILED {type(e).__name__}: {str(e)[:150]}")
