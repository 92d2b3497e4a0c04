"""Job 108 (round 4): Pallas grid-step overhead microbenchmark.

Job 107: the fused-MBConv kernel is DMA/overhead-bound — 'noio' (3
neighbor fetches + center copy, no compute) costs ~7-15 us per grid
step. Bisect: fixed per-step overhead vs clamped-3-fetch DMA cost.

  copy1    - single input block (1,28,114,32), grid (256,4): y = 2x
  copyimg  - whole-image blocks (1,112,114,32), grid (256,)
  copy8    - 8 images/step (8,112,114,32), grid (32,)
  nbr3     - 3 clamped neighbor fetches + center copy, grid (256,4)
  nbr3img  - 3 clamped neighbor fetches, whole-image rows via batch
             neighbors? n/a - replaced by: whole-image blocks where
             halo is WITHIN the block (no neighbor fetch needed),
             grid (256,)
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, WP, C = 256, 112, 114, 32
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, WP, C), jnp.bfloat16)


def run(name, call, *args):
    try:
        f = jax.jit(lambda *a: call(*a))
        f(*args)
        t = timeit(f, *args, k=20)
        gb = (x.size * 2 * 2) / 1e9
        log(f"{name}: {t:.3f} ms  ({gb/t*1e3:.0f} GB/s logical r+w)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


# (a) single-block copy, grid (256, 4)
def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


run("copy1 grid(256,4) blk(1,28,114,32)", pl.pallas_call(
    k_copy, grid=(B, 4),
    in_specs=[pl.BlockSpec((1, 28, WP, C), lambda b, j: (b, j, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 28, WP, C), lambda b, j: (b, j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x)

run("copyimg grid(256,) blk(1,112,114,32)", pl.pallas_call(
    k_copy, grid=(B,),
    in_specs=[pl.BlockSpec((1, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x)

run("copy8 grid(32,) blk(8,112,114,32)", pl.pallas_call(
    k_copy, grid=(B // 8,),
    in_specs=[pl.BlockSpec((8, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x)


# (d) 3 clamped neighbor fetches + center copy, grid (256, 4)
def k_nbr(xp_ref, xc_ref, xn_ref, o_ref):
    o_ref[:] = (xc_ref[:] * 2.0
                + xp_ref[:, 27:28] * 0.0 + xn_ref[:, 0:1] * 0.0)


run("nbr3 grid(256,4) 3x blk(1,28,114,32)", pl.pallas_call(
    k_nbr, grid=(B, 4),
    in_specs=[
        pl.BlockSpec((1, 28, WP, C),
                     lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 28, WP, C), lambda b, j: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 28, WP, C),
                     lambda b, j: (b, jnp.minimum(j + 1, 3), 0, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, 28, WP, C), lambda b, j: (b, j, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x)


# (e) whole-image block: halo within block, no neighbor fetch;
#     the body does the 9-tap depthwise on the full image in VMEM.
def k_img_dw(x_ref, wd_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)  # (H, WP, C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, WP, 1), 0)
    acc = None
    for di in range(3):
        # no row pad in HBM: emulate via where on shifted row index
        lo, hi = di - 1, di - 1 + H - 2
        sl = v[max(lo, 0):min(H, H + hi - (H - 3)), :, :]
        # keep it simple: center rows only for overhead measurement
        break
    acc = None
    for di in range(3):
        for dj in range(3):
            t = (v[di:di + H - 2, dj:dj + WP - 2, :]
                 * wd_ref[3 * di + dj][None, None, :])
            acc = t if acc is None else acc + t
    o_ref[0, 1:H - 1, 1:WP - 1, :] = acc.astype(o_ref.dtype)
    o_ref[0, 0:1] = jnp.zeros_like(o_ref[0, 0:1])
    o_ref[0, H - 1:H] = jnp.zeros_like(o_ref[0, H - 1:H])


wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32) * 0.2
run("imgdw grid(256,) whole-image 9-tap dw", pl.pallas_call(
    k_img_dw, grid=(B,),
    in_specs=[
        pl.BlockSpec((1, H, WP, C), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x, wd9)

# (f) 4 images per step, whole-image, 9-tap dw
def k_img4_dw(x_ref, wd_ref, o_ref):
    v = x_ref[:].astype(jnp.float32)  # (4, H, WP, C)
    acc = None
    for di in range(3):
        for dj in range(3):
            t = (v[:, di:di + H - 2, dj:dj + WP - 2, :]
                 * wd_ref[3 * di + dj][None, None, None, :])
            acc = t if acc is None else acc + t
    o_ref[:, 1:H - 1, 1:WP - 1, :] = acc.astype(o_ref.dtype)
    o_ref[:, 0:1] = jnp.zeros_like(o_ref[:, 0:1])
    o_ref[:, H - 1:H] = jnp.zeros_like(o_ref[:, H - 1:H])


run("img4dw grid(64,) 4-image 9-tap dw", pl.pallas_call(
    k_img4_dw, grid=(B // 4,),
    in_specs=[
        pl.BlockSpec((4, H, WP, C), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((4, H, WP, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WP, C), jnp.bfloat16)), x, wd9)
