# Job 062: int8 potential at REAL RN50 1x1-conv shapes (B=256).
# Job 061: int8 3x3 conv loses (0.65x) but a big int8 dot wins 1.60x.
# RN50's pointwise convs ARE dots (CONVNET_TPU_1X1_DOT formulation) --
# measure bf16 dot vs int8 dot WITH the per-channel dequant epilogue
# (int32 * scale -> bf16) a PTQ path would actually pay.
import time

import jax.lax as lax


def timeit_local(fn, *args, k=30):
    out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / k * 1e3


@jax.jit
def dot_bf16(a, b):
    return a @ b


@jax.jit
def dot_i8_dequant(a, b, scale):
    # per-output-channel dequant epilogue: what PTQ inference pays
    acc = lax.dot(a, b, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)


# (M, K, N) for every distinct RN50 1x1 conv at B=256 + the fc
SHAPES = [
    ("l1 in",   256 * 56 * 56, 64, 256),
    ("l1 red",  256 * 56 * 56, 256, 64),
    ("l2 red",  256 * 28 * 28, 512, 128),
    ("l2 out",  256 * 28 * 28, 128, 512),
    ("l3 red",  256 * 14 * 14, 1024, 256),
    ("l3 out",  256 * 14 * 14, 256, 1024),
    ("l4 red",  256 * 7 * 7, 2048, 512),
    ("l4 out",  256 * 7 * 7, 512, 2048),
    ("ds l2",   256 * 28 * 28, 256, 512),
    ("fc",      256, 2048, 1000),
]

key = jax.random.PRNGKey(0)
tot_bf, tot_i8 = 0.0, 0.0
for name, m, kk, n in SHAPES:
    ab = jax.random.normal(key, (m, kk), jnp.bfloat16)
    bb = jax.random.normal(key, (kk, n), jnp.bfloat16)
    ai = jnp.clip(ab * 30, -127, 127).astype(jnp.int8)
    bi = jnp.clip(bb * 30, -127, 127).astype(jnp.int8)
    sc = jnp.full((n,), 1e-3, jnp.float32)
    t_bf = timeit_local(dot_bf16, ab, bb)
    t_i8 = timeit_local(dot_i8_dequant, ai, bi, sc)
    tot_bf += t_bf
    tot_i8 += t_i8
    log(f"{name:7s} M={m:>7d} K={kk:>4d} N={n:>4d}: "
        f"bf16 {t_bf:7.3f} ms  int8+dq {t_i8:7.3f} ms "
        f"({t_bf / t_i8:.2f}x)")
log(f"TOTAL bf16 {tot_bf:.2f} ms vs int8 {tot_i8:.2f} ms "
    f"({tot_bf / tot_i8:.2f}x) -- one-occurrence-per-shape sum, "
    f"NOT weighted by per-model multiplicity")
