# Job 064: attribute the model-level int8 loss (job 063: 0.16-0.29x).
# Decompose conv1x1_int8 at the l1 shape [256*56*56, 64] -> 256.
import time

import jax.lax as lax

from convnet_tpu.nn.quant import conv1x1_int8, quantize_act


def t(fn, *args, k=30):
    out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / k * 1e3


key = jax.random.PRNGKey(0)
x4 = jax.random.normal(key, (256, 56, 56, 64), jnp.bfloat16)
w = jax.random.normal(key, (1, 1, 64, 256), jnp.bfloat16) * 0.1
xf = x4.reshape(-1, 64)
scale = float(jnp.max(jnp.abs(xf))) / 127.0

log(f"A full conv1x1_int8:        {t(jax.jit(lambda a, b: conv1x1_int8(a, b, scale)), x4, w):7.3f} ms")
log(f"B bf16 dot (reference):     {t(jax.jit(lambda a, b: a @ b.reshape(64, 256)), xf, w):7.3f} ms")

# C: quantize pass alone (fp32-upcast version, as shipped)
log(f"C quantize_act fp32 path:   {t(jax.jit(lambda a: quantize_act(a, scale)), xf):7.3f} ms")


# D: quantize staying in bf16 (ints <= 127 exact in bf16)
@jax.jit
def quant_bf16(a):
    inv = jnp.bfloat16(1.0 / scale)
    return jnp.clip(jnp.round(a * inv), -127, 127).astype(jnp.int8)


log(f"D quantize_act bf16 path:   {t(quant_bf16, xf):7.3f} ms")

xq = quant_bf16(xf)
wq = jnp.clip(jnp.round(w.reshape(64, 256) / jnp.bfloat16(0.001)),
              -127, 127).astype(jnp.int8)


# E: int8 dot alone (pre-quantized, int32 out) — job 062 said ~1.76
@jax.jit
def dot_i8(a, b):
    return lax.dot(a, b, preferred_element_type=jnp.int32)


log(f"E int8 dot alone:           {t(dot_i8, xq, wq):7.3f} ms")


# F: int8 dot + fp32 dequant epilogue (job 062's exact measured form)
sc = jnp.full((256,), 1e-3, jnp.float32)


@jax.jit
def dot_i8_dq(a, b):
    return (lax.dot(a, b, preferred_element_type=jnp.int32)
            .astype(jnp.float32) * sc).astype(jnp.bfloat16)


log(f"F int8 dot + fp32 dequant:  {t(dot_i8_dq, xq, wq):7.3f} ms")


# G: D+F chained under ONE jit (quantize + dot + dequant, no weight
# quantization) — isolates whether the loss is in op chaining/fusion
@jax.jit
def chain(a, b):
    q = jnp.clip(jnp.round(a * jnp.bfloat16(1.0 / scale)),
                 -127, 127).astype(jnp.int8)
    return (lax.dot(q, b, preferred_element_type=jnp.int32)
            .astype(jnp.float32) * sc).astype(jnp.bfloat16)


log(f"G quant+dot+dequant chain:  {t(chain, xf, wq):7.3f} ms")
