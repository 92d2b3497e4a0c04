"""Job 035: bisect which construct in pool_bwd's kernel crashes the
Mosaic compiler (job 033: HTTP 500 at every shape, incl. stride-1)."""
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 8, 16, 16, 8


def try_case(name, fn):
    try:
        out = fn()
        fetch1(out)
        log(f"{name}: OK")
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}")


# 1: rank-5 output block, static index write
def k1(dy_ref, dx_ref):
    dx_ref[:, :, 0, :, :] = dy_ref[...]
    dx_ref[:, :, 1, :, :] = dy_ref[...] * 2


def c1():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    return pl.pallas_call(
        k1, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, 2, W, C), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, W, C), jnp.bfloat16),
    )(dy)


# 2: rank-4 in/out with pad+slice shift
def k2(dy_ref, dx_ref):
    m = dy_ref[...]
    m = jax.lax.pad(m, jnp.zeros((), m.dtype),
                    [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 0)])
    dx_ref[...] = jax.lax.slice(m, (0, 0, 1, 0), (4, H, W + 1, C))


def c2():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    return pl.pallas_call(
        k2, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
    )(dy)


# 3: stack+reshape W-interleave, rank-4 out
def k3(dy_ref, dx_ref):
    a = dy_ref[...]
    s = jnp.stack([a, a * 2], axis=3)        # [4,H,W,2,C]
    dx_ref[...] = s.reshape(4, H, W * 2, C)


def c3():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    return pl.pallas_call(
        k3, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, W * 2, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * 2, C), jnp.bfloat16),
    )(dy)


# 4: equality-compare masking in bf16
def k4(idx_ref, dy_ref, dx_ref):
    dy = dy_ref[...]
    m = dy * (idx_ref[...] == jnp.asarray(3, dy.dtype))
    dx_ref[...] = m


def c4():
    dy = jnp.ones((B, H, W, C), jnp.bfloat16)
    idx = jnp.asarray(
        jax.random.randint(jax.random.PRNGKey(0), (B, H, W, C), 0, 9),
        jnp.bfloat16)
    return pl.pallas_call(
        k4, grid=(B // 4,),
        in_specs=[pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((4, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
    )(idx, dy)


try_case("rank5-out+static-writes", c1)
try_case("pad+slice-shift", c2)
try_case("stack-reshape-interleave", c3)
try_case("bf16-eq-mask", c4)
