"""Session 30: conv WEIGHT-grad cost — XLA transpose emitter vs
explicit dot contraction.

Profiling (tpu_profile_rn50_results.txt) showed conv wgrads cost
56.6 ms of the 104.6 ms RN50 step (fwd 18.0, dgrad 5.6) — the
transpose emitter runs ~3x slower than forward at equal FLOPs, and
XLA's own cost model agrees (137 Mcycles bwd vs 54 fwd). Hypothesis:
contracting over batch*space as an explicit dot_general
([BHW,Cin]^T @ [BHW,Cout], per tap for 3x3) lets the MXU stream the
reduction dimension instead of whatever the conv emitter does.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench30_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from jax import lax
log(f"30 sanity {float(jnp.ones((2,2)).sum())}")


def fetch1(out):
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


DIMS = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride=1, pad=0):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=DIMS)


def wgrad_native(x, dy, kshape, stride=1, pad=0):
    f = lambda w: jnp.sum(conv(x, w, stride, pad) * dy)
    return jax.grad(f)(jnp.zeros(kshape, x.dtype))


def wgrad_dot(x, dy, kshape, stride=1, pad=0):
    kh, kw, cin, cout = kshape
    b, h, w_, c = x.shape
    ho, wo = dy.shape[1], dy.shape[2]
    dyf = dy.reshape(b * ho * wo, cout)
    if (kh, kw, stride, pad) == (1, 1, 1, 0):
        return lax.dot_general(
            x.reshape(b * h * w_, cin), dyf,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(kshape)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    for di in range(kh):
        for dj in range(kw):
            patch = lax.slice(
                xp, (0, di, dj, 0),
                (b, di + (ho - 1) * stride + 1,
                 dj + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1))
            taps.append(lax.dot_general(
                patch.reshape(b * ho * wo, cin), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(kshape)


CASES = [
    ((256, 56, 56, 256), (1, 1, 256, 64), 1, 0),
    ((256, 56, 56, 64), (1, 1, 64, 256), 1, 0),
    ((256, 56, 56, 64), (3, 3, 64, 64), 1, 1),
    ((256, 28, 28, 512), (1, 1, 512, 128), 1, 0),
    ((256, 28, 28, 128), (3, 3, 128, 128), 1, 1),
    ((256, 14, 14, 256), (3, 3, 256, 256), 1, 1),
    ((256, 112, 112, 64), (3, 3, 64, 64), 2, 1),  # stride-2 case
]
for xshape, kshape, stride, pad in CASES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xshape), dtype=jnp.bfloat16)
    ho = (xshape[1] + 2 * pad - kshape[0]) // stride + 1
    dy = jnp.asarray(rng.standard_normal(
        (xshape[0], ho, ho, kshape[3])), dtype=jnp.bfloat16)
    nat = jax.jit(lambda x_, dy_: wgrad_native(x_, dy_, kshape, stride, pad))
    dot = jax.jit(lambda x_, dy_: wgrad_dot(x_, dy_, kshape, stride, pad))
    a = np.asarray(nat(x, dy), np.float32)
    bv = np.asarray(dot(x, dy), np.float32)
    rel = np.abs(a - bv).max() / max(np.abs(a).max(), 1e-9)
    log(f"x{xshape} k{kshape} s{stride}: native {timeit(nat, x, dy):6.2f} ms"
        f" | dot {timeit(dot, x, dy):6.2f} ms | rel {rel:.2e}")
log("session 30 complete")
OUT.close()
