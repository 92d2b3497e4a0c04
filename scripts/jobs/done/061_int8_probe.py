# Job 061: int8 feasibility probe for a PTQ serving path.
# v5e MXU peak is 394 TOPS int8 vs 197 TFLOPs bf16 -- IF XLA lowers
# int8 convs to the MXU on this backend, a post-training-quantized
# inference path is worth building. Measure a representative RN50
# stage conv and a big matmul, int8-accum-int32 vs bf16.
import time
from functools import partial

import jax.lax as lax

DN = ("NHWC", "HWIO", "NHWC")


def timeit_local(fn, *args, k=30):
    out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / k * 1e3


@partial(jax.jit, static_argnames=())
def conv_bf16(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


@jax.jit
def conv_i8(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN,
                                    preferred_element_type=jnp.int32)


@jax.jit
def dot_bf16(a, b):
    return a @ b


@jax.jit
def dot_i8(a, b):
    return lax.dot(a, b, preferred_element_type=jnp.int32)


# RN50 stage-2 shape: [256,56,56,64] x 3x3x64x64
key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (256, 56, 56, 64), jnp.bfloat16)
wb = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16)
xi = jnp.clip(xb * 30, -127, 127).astype(jnp.int8)
wi = jnp.clip(wb * 30, -127, 127).astype(jnp.int8)

try:
    ms = timeit_local(conv_bf16, xb, wb)
    log(f"conv bf16 [256,56,56,64]x3x3: {ms:.3f} ms")
    ms8 = timeit_local(conv_i8, xi, wi)
    log(f"conv int8 same shape:          {ms8:.3f} ms "
        f"({ms / ms8:.2f}x vs bf16)")
except Exception as e:
    log(f"int8 conv FAILED: {type(e).__name__}: {e}")

# big matmul (1x1-conv-like): [256*3136, 256] x [256, 256]
ab = jax.random.normal(key, (8192, 2048), jnp.bfloat16)
bb = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
ai = jnp.clip(ab * 30, -127, 127).astype(jnp.int8)
bi = jnp.clip(bb * 30, -127, 127).astype(jnp.int8)
try:
    ms = timeit_local(dot_bf16, ab, bb)
    log(f"dot bf16 [8192,2048]x[2048,2048]: {ms:.3f} ms")
    ms8 = timeit_local(dot_i8, ai, bi)
    log(f"dot int8 same shape:               {ms8:.3f} ms "
        f"({ms / ms8:.2f}x vs bf16)")
except Exception as e:
    log(f"int8 dot FAILED: {type(e).__name__}: {e}")
