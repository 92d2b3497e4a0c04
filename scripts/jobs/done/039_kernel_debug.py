"""Job 039: isolate kernel-v2's remaining Mosaic failure with full
error text, and bisect jnp.where + rank-5 write of a COMPUTED value."""
import os
for key in list(os.environ):
    if key.startswith("CONVNET_TPU_"):
        del os.environ[key]

from jax.experimental import pallas as pl

B, H, W, C = 8, 16, 16, 8


def try_case(name, fn):
    try:
        out = fn()
        fetch1(out)
        log(f"{name}: OK")
    except Exception as e:
        msg = str(e)
        key = msg[msg.find("MLIR operation"):][:200] if "MLIR" in msg else msg[:300]
        log(f"{name}: FAIL {type(e).__name__}: {key}")


# A: jnp.where masking
def kA(idx_ref, dy_ref, dx_ref):
    dy = dy_ref[...]
    dx_ref[...] = jnp.where(idx_ref[...] == jnp.asarray(3, dy.dtype),
                            dy, jnp.zeros((), dy.dtype))


def cA():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    idx = jnp.asarray(
        jax.random.randint(jax.random.PRNGKey(0), (B, H, W, C), 0, 9)
    ).astype(jnp.bfloat16)
    return pl.pallas_call(
        kA, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
    )(idx, dy)


# B: computed value into rank-5 static slot
def kB(dy_ref, dx_ref):
    m = dy_ref[...]
    m = jax.lax.pad(m, jnp.zeros((), m.dtype),
                    [(0, 0, 0), (1, 0, 0), (0, 0, 0), (0, 0, 0)])
    m = jax.lax.slice(m, (0, 0, 0, 0), (4, H, W, C))
    dx_ref[:, :, 0, :, :] = m
    dx_ref[:, :, 1, :, :] = m + m


def cB():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    return pl.pallas_call(
        kB, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, 2, W, C), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, W, C), jnp.bfloat16),
    )(dy)


# C: the real pool_bwd kernel at a small stride-1 shape, full error
def cC():
    from convnet_tpu.ops.pallas import pool_bwd as pb
    idx = jnp.zeros((8, 14, 14, 128), jnp.uint8)
    dy = jnp.ones((8, 14, 14, 128), jnp.bfloat16)
    return pb.max_pool2d_bwd_pallas(3, 1, 1, (8, 14, 14, 128),
                                    "bfloat16", idx, dy)


# D: the real kernel at the stem shape (stride 2), full error
def cD():
    from convnet_tpu.ops.pallas import pool_bwd as pb
    idx = jnp.zeros((8, 32, 32, 64), jnp.uint8)
    dy = jnp.ones((8, 16, 16, 64), jnp.bfloat16)
    return pb.max_pool2d_bwd_pallas(3, 2, 1, (8, 32, 32, 64),
                                    "bfloat16", idx, dy)


try_case("where-mask", cA)
try_case("rank5-computed-write", cB)
try_case("real-kernel-s1", cC)
try_case("real-kernel-s2", cD)
