"""Job 109 (round 4): DMA rate vs array layout for Pallas blocks.

Job 108: a pure copy kernel on (256,112,114,32) bf16 runs at 50 GB/s
logical — the 32-channel minor dim gives 64 B contiguous runs. Theory:
Pallas block DMA needs a large (>=512B, ideally 128-lane-aligned)
minor dim. Measurements:

  c128        - copy on (256,112,114,128): 256B rows, lane-aligned
  fold3648    - copy on (256,112,3648): folded (W+2)*C, NOT 128-mult
  fold3712    - copy on (256,112,3712): folded (W+4)*C, 29*128 lanes
  dwfold      - whole-image folded depthwise: sublane-sliced row taps
                + lane-sliced col taps, fp32 acc, (B,) grid
  reshapecost - folded in, in-kernel reshape (114,3712)->(3306?,128)
                roundtrip + copy out (relayout cost probe)
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H = 256, 112


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def run_copy(name, shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    blk = (1,) + shape[1:]
    call = pl.pallas_call(
        k_copy, grid=(shape[0],),
        in_specs=[pl.BlockSpec(blk, lambda b: (b,) + (0,) * (len(shape) - 1),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, lambda b: (b,) + (0,) * (len(shape) - 1),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16))
    try:
        f = jax.jit(lambda a: call(a))
        f(x)
        t = timeit(f, x, k=20)
        import numpy as _np
        gb = (_np.prod(shape) * 2 * 2) / 1e9
        log(f"{name}: {t:.3f} ms  ({gb/t*1e3:.0f} GB/s logical r+w)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


run_copy("c128  (256,112,114,128)", (B, H, 114, 128))
run_copy("c32   (256,112,114,32) [control]", (B, H, 114, 32))
run_copy("fold3648 (256,112,3648)", (B, H, 3648))
run_copy("fold3712 (256,112,3712)", (B, H, 3712))
run_copy("fold2d (28672,3712)", (B * H, 3712))

# --- folded whole-image depthwise ---
W, C = 112, 32
WP = W + 4                 # cols padded 1 left / 3 right -> 116
WPC = WP * C               # 3712 = 29*128
HP = H + 2                 # rows padded 1/1

x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
xf = jnp.pad(x4, ((0, 0), (1, 1), (1, 3), (0, 0))).reshape(B, HP, WPC)
wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32) * 0.2
# per-(di,dj) folded weight rows: lane l = w*C + c -> wd[di,dj,c]
wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WPC)


def k_dwfold(x_ref, w_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)          # (HP, WPC)
    acc = None
    for di in range(3):
        rows = v[di:di + H, :]                # sublane-offset slice
        for dj in range(3):
            shifted = rows if dj == 0 else jnp.concatenate(
                [rows[:, dj * C:], jnp.zeros((H, dj * C), jnp.float32)],
                axis=1)
            t = shifted * w_ref[3 * di + dj][None, :]
            acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


call = pl.pallas_call(
    k_dwfold, grid=(B,),
    in_specs=[
        pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, WPC), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, H, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WPC), jnp.bfloat16))
try:
    f = jax.jit(lambda a, w: call(a, w))
    out = f(xf, wrows)
    # parity vs XLA depthwise
    ref = jax.lax.conv_general_dilated(
        x4, wd9.T.reshape(3, 3, 1, C).transpose(0, 1, 2, 3) * 0 +
        jnp.transpose(wd9.reshape(3, 3, C), (0, 1, 2)).reshape(3, 3, 1, C),
        (1, 1), ((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = out.reshape(B, H, WP, C)[:, :, 1:1 + W, :]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    t = timeit(f, xf, wrows, k=20)
    gb = (xf.size + out.size) * 2 / 1e9
    log(f"dwfold whole-image: {t:.3f} ms ({gb/t*1e3:.0f} GB/s) "
        f"maxerr {err:.5f}")
except Exception as e:
    log(f"dwfold: FAILED {type(e).__name__}: {str(e)[:200]}")


# --- relayout cost: folded in -> (pixels, C) -> matmul-shaped -> back
def k_reshape(x_ref, o_ref):
    v = x_ref[0]                              # (HP, WPC) bf16
    p = v.reshape(HP * WP, C)                 # relayout
    p = p * 2.0
    o_ref[0] = p.reshape(HP, WPC)


call = pl.pallas_call(
    k_reshape, grid=(B,),
    in_specs=[pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, HP, WPC), jnp.bfloat16))
try:
    f = jax.jit(lambda a: call(a))
    f(xf)
    t = timeit(f, xf, k=20)
    gb = (xf.size * 2 * 2) / 1e9
    log(f"reshapecost roundtrip: {t:.3f} ms ({gb/t*1e3:.0f} GB/s eq)")
except Exception as e:
    log(f"reshapecost: FAILED {type(e).__name__}: {str(e)[:160]}")
