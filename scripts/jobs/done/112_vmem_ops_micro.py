"""Job 112 (round 4): floor-free DMA rates + in-VMEM shift/reshape
costs — the decision data for the fused-MBConv layout redesign.

All arrays sized so times >> the ~2 ms dispatch floor (B=1024).

  dma4d     - copy (1024,112,114,32) 4D small-C     [1.63 GB r+w]
  dmafold   - copy (1024,112,3712) folded           [1.70 GB r+w]
  dmaxla    - XLA x*2 on the folded array (reference)
  rowshift  - folded: out = sum of 3 row(sublane)-shifted copies
  colshift  - folded: out = sum of 3 col(lane)-shifted copies (concat)
  colroll   - same via pltpu.roll
  reshape   - folded (120,3712)->(1740?,256)... use (HP*WP, C) roundtrip
  dwfold    - full 9-tap folded depthwise, parity vs XLA (dtype fixed)
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 1024, 112, 112, 32
WP = W + 4
WPC = WP * C               # 3712
HP = 120                   # rows padded to an 8-multiple

x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, 114, C), jnp.bfloat16)
xf = jax.random.normal(jax.random.PRNGKey(0), (B, H, WPC), jnp.bfloat16)


def timed(name, f, *args, gb):
    try:
        f(*args)
        t = timeit(f, *args, k=10)
        log(f"{name}: {t:.3f} ms ({gb/t*1e3:.0f} GB/s)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


call = pl.pallas_call(
    k_copy, grid=(B,),
    in_specs=[pl.BlockSpec((1, H, 114, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, H, 114, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, 114, C), jnp.bfloat16))
timed("dma4d ", jax.jit(lambda a: call(a)), x4,
      gb=x4.size * 2 * 2 / 1e9)

call = pl.pallas_call(
    k_copy, grid=(B,),
    in_specs=[pl.BlockSpec((1, H, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, H, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WPC), jnp.bfloat16))
timed("dmafold", jax.jit(lambda a: call(a)), xf,
      gb=xf.size * 2 * 2 / 1e9)

timed("dmaxla ", jax.jit(lambda a: a * 2.0), xf, gb=xf.size * 2 * 2 / 1e9)


def mk(body, in_rows=H):
    return pl.pallas_call(
        body, grid=(B,),
        in_specs=[pl.BlockSpec((1, in_rows, WPC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, WPC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WPC), jnp.bfloat16))


def k_rowshift(x_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)          # (H, WPC)
    acc = v[0:H - 2, :] + v[1:H - 1, :] + v[2:H, :]
    o_ref[0] = jnp.concatenate(
        [acc, jnp.zeros((2, WPC), jnp.float32)], axis=0).astype(o_ref.dtype)


timed("rowshift(sublane x3)", jax.jit(lambda a: mk(k_rowshift)(a)), xf,
      gb=xf.size * 2 * 2 / 1e9)


def k_colshift(x_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    acc = v
    for dj in (1, 2):
        acc = acc + jnp.concatenate(
            [v[:, dj * C:], jnp.zeros((H, dj * C), jnp.float32)], axis=1)
    o_ref[0] = acc.astype(o_ref.dtype)


timed("colshift(lane concat x2)", jax.jit(lambda a: mk(k_colshift)(a)), xf,
      gb=xf.size * 2 * 2 / 1e9)


def k_colroll(x_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    acc = v
    for dj in (1, 2):
        acc = acc + pltpu.roll(v, WPC - dj * C, 1)
    o_ref[0] = acc.astype(o_ref.dtype)


timed("colroll(lane roll x2)  ", jax.jit(lambda a: mk(k_colroll)(a)), xf,
      gb=xf.size * 2 * 2 / 1e9)


def k_reshape(x_ref, o_ref):
    v = x_ref[0]                               # (H, WPC) bf16
    p = v.reshape(H * WP, C).astype(jnp.float32) * 2.0
    o_ref[0] = p.astype(jnp.bfloat16).reshape(H, WPC)


timed("reshape roundtrip      ", jax.jit(lambda a: mk(k_reshape)(a)), xf,
      gb=xf.size * 2 * 2 / 1e9)

# ---- full 9-tap folded depthwise with parity (B=256 for parity cost) ----
B2 = 256
x4s = jax.random.normal(jax.random.PRNGKey(0), (B2, H, W, C), jnp.bfloat16)
xfs = jnp.pad(x4s, ((0, 0), (1, 7), (1, 3), (0, 0))).reshape(B2, HP, WPC)
wd9 = (jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32)
       * 0.2)
wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WPC)


def k_dw(x_ref, w_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)           # (HP, WPC)
    acc = None
    for di in range(3):
        rows = v[di:di + H, :]
        for dj in range(3):
            if dj == 0:
                sh = rows
            else:
                sh = jnp.concatenate(
                    [rows[:, dj * C:],
                     jnp.zeros((H, dj * C), jnp.float32)], axis=1)
            t = sh * w_ref[3 * di + dj][None, :]
            acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


call = pl.pallas_call(
    k_dw, grid=(B2,),
    in_specs=[
        pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, WPC), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, H, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B2, H, WPC), jnp.bfloat16))
try:
    f = jax.jit(lambda a, w: call(a, w))
    out = f(xfs, wrows)
    ref = jax.lax.conv_general_dilated(
        x4s, wd9.reshape(3, 3, 1, C).astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = out.reshape(B2, H, WP, C)[:, :, 0:W, :]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    t = timeit(f, xfs, wrows, k=20)
    # XLA dw reference timing
    fx = jax.jit(lambda a: jax.lax.conv_general_dilated(
        a, wd9.reshape(3, 3, 1, C).astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    fx(x4s)
    tx = timeit(fx, x4s, k=20)
    log(f"dwfold 9-tap: {t:.3f} ms vs XLA dw {tx:.3f} ms  maxerr {err:.5f}")
except Exception as e:
    log(f"dwfold: FAILED {type(e).__name__}: {str(e)[:200]}")
