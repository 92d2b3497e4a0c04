"""Job 114 (round 4): find a compiling folded->pixel-major path for
the MBConv matmuls, and fix the dwfold 500 (1D weight-row suspicion).

On (B=256, H=112, WP=116, C=32, Ch=96) folded blocks:
  laneSplit   - v(H,WPC) -> reshape (H,WP,C) -> dot3d -> reshape back
  pixMajor    - v(H,WPC) -> reshape (H*WP, C) -> dot -> back [500 rerun]
  rowChunk    - reshape+dot on 8-row chunks in a python loop
  dw2d        - job-112 dwfold with 2D w_ref[k:k+1,:] slices
  fullBlock   - dw2d + laneSplit project (the folded no-expand block)
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CH = 256, 112, 112, 32, 96
WP = W + 4
WPC = WP * C
WPCH = WP * CH           # 11136 = 87*128
HP = 120

x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
xf = jnp.pad(x4, ((0, 0), (1, 7), (1, 3), (0, 0))).reshape(B, HP, WPC)
we = jax.random.normal(jax.random.PRNGKey(1), (C, CH), jnp.bfloat16) * 0.2


def run(name, call, *args, ref=None, gotmap=None):
    try:
        f = jax.jit(lambda *a: call(*a))
        out = f(*args)
        t = timeit(f, *args, k=20)
        note = ""
        if ref is not None:
            got = gotmap(out) if gotmap else out
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            note = f"  maxerr {err:.5f}"
        log(f"{name}: {t:.3f} ms{note}")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


ref_h1 = jnp.einsum("bhwc,cd->bhwd", x4, we,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def spec_in():
    return [
        pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, CH), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def out_spec(lanes):
    return (pl.BlockSpec((1, H, lanes), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((B, H, lanes), jnp.bfloat16))


# (a) lane-split 3D view + dot_general on minor dim
def k_lanesplit(x_ref, w_ref, o_ref):
    v = x_ref[0][1:1 + H, :].reshape(H, WP, C)
    h = jax.lax.dot_general(v, w_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = h.astype(jnp.bfloat16).reshape(H, WPCH)


os_, osh = out_spec(WPCH)
run("laneSplit", pl.pallas_call(k_lanesplit, grid=(B,),
                                in_specs=spec_in(), out_specs=os_,
                                out_shape=osh), xf, we,
    ref=ref_h1,
    gotmap=lambda o: o.reshape(B, H, WP, CH)[:, :, 1:1 + W, :])


# (b) pixel-major reshape + plain dot
def k_pix(x_ref, w_ref, o_ref):
    v = x_ref[0][1:1 + H, :].reshape(H * WP, C)
    h = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = h.astype(jnp.bfloat16).reshape(H, WPCH)


run("pixMajor ", pl.pallas_call(k_pix, grid=(B,),
                                in_specs=spec_in(), out_specs=os_,
                                out_shape=osh), xf, we,
    ref=ref_h1,
    gotmap=lambda o: o.reshape(B, H, WP, CH)[:, :, 1:1 + W, :])


# (c) 8-row chunks
def k_rowchunk(x_ref, w_ref, o_ref):
    for r0 in range(0, H, 8):
        v = x_ref[0][1 + r0:1 + r0 + 8, :].reshape(8 * WP, C)
        h = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[0, r0:r0 + 8, :] = h.astype(jnp.bfloat16).reshape(8, WPCH)


run("rowChunk ", pl.pallas_call(k_rowchunk, grid=(B,),
                                in_specs=spec_in(), out_specs=os_,
                                out_shape=osh), xf, we,
    ref=ref_h1,
    gotmap=lambda o: o.reshape(B, H, WP, CH)[:, :, 1:1 + W, :])

# (d) dwfold with 2D weight slices
wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32) * 0.2
wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WPC)
ref_dw = jax.lax.conv_general_dilated(
    x4, wd9.reshape(3, 3, 1, C).astype(jnp.bfloat16), (1, 1),
    ((1, 1), (1, 1)), feature_group_count=C,
    dimension_numbers=("NHWC", "HWIO", "NHWC"))


def k_dw2d(x_ref, w_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    acc = None
    for di in range(3):
        rows = v[di:di + H, :]
        for dj in range(3):
            sh = rows if dj == 0 else jnp.concatenate(
                [rows[:, dj * C:], jnp.zeros((H, dj * C), jnp.float32)],
                axis=1)
            t = sh * w_ref[3 * di + dj:3 * di + dj + 1, :]
            acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


os2, osh2 = out_spec(WPC)
run("dw2d     ", pl.pallas_call(
    k_dw2d, grid=(B,),
    in_specs=[pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((9, WPC), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=os2, out_shape=osh2), xf, wrows,
    ref=ref_dw, gotmap=lambda o: o.reshape(B, H, WP, C)[:, :, 0:W, :])

# (e) folded no-expand block: dw (+relu6) + project via laneSplit dot
wpj = jax.random.normal(jax.random.PRNGKey(3), (C, 16), jnp.bfloat16) * 0.2
ref_blk = jnp.einsum(
    "bhwc,cd->bhwd",
    jnp.clip(ref_dw.astype(jnp.float32), 0.0, 6.0).astype(jnp.bfloat16),
    wpj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
WPO = WP * 16


def k_full(x_ref, w_ref, wp_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    acc = None
    for di in range(3):
        rows = v[di:di + H, :]
        for dj in range(3):
            sh = rows if dj == 0 else jnp.concatenate(
                [rows[:, dj * C:], jnp.zeros((H, dj * C), jnp.float32)],
                axis=1)
            t = sh * w_ref[3 * di + dj:3 * di + dj + 1, :]
            acc = t if acc is None else acc + t
    u = jnp.clip(acc, 0.0, 6.0).astype(jnp.bfloat16).reshape(H, WP, C)
    y = jax.lax.dot_general(u, wp_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(jnp.bfloat16).reshape(H, WPO)


run("fullBlock", pl.pallas_call(
    k_full, grid=(B,),
    in_specs=[pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((9, WPC), lambda b: (0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((C, 16), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, H, WPO), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, WPO), jnp.bfloat16)),
    xf, wrows, wpj,
    ref=ref_blk, gotmap=lambda o: o.reshape(B, H, WP, 16)[:, :, 0:W, :])

# XLA chain reference timing for (e)'s math
f_ref = jax.jit(lambda a: jnp.einsum(
    "bhwc,cd->bhwd",
    jnp.clip(jax.lax.conv_general_dilated(
        a, wd9.reshape(3, 3, 1, C).astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32),
        0.0, 6.0).astype(jnp.bfloat16),
    wpj, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
f_ref(x4)
log(f"XLA chain dw+relu6+proj: {timeit(f_ref, x4, k=20):.3f} ms")
