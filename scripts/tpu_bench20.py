"""Session 20: Pallas implicit-im2col conv for C=64 3x3/s1 (layer-1 shape).

The C=64 stages cap at 25% MXU utilization when lowered as 9 K=64
matmuls (K=N=64 half-fills the 128x128 array). This kernel packs tap
PAIRS on the contraction dim: [x_t1 | x_t2] (M,128) @ [w_t1; w_t2]
(128,64) computes the two-tap partial sum at K=128 — 9 taps become
5 dots (last zero-padded), doubling the K-side fill. N=64 stays the
hard ceiling (50%).

Layout choices for Mosaic:
- grid over batch; whole padded image (58x66x64 bf16, 490 KB) per
  program in VMEM;
- W padded to 64 so the (8,64,64)->(512,64) tap-slice reshape merges
  a 64-sublane dim (multiple of the bf16 16-sublane tile) — free;
- tap slices use static H offsets (major, free) and small static W
  (sublane) offsets 0..2.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench20_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log(f"sanity {float(jnp.ones((2,2)).sum())}")

def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])

def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k

B, H, W, C = 256, 56, 56, 64
CO = 64
HT = 8                      # output rows per inner tile
WP = 64                     # padded W for aligned reshapes

def pack_weights(w):  # (3,3,64,64) -> (5,128,64), tap pairs on K
    taps = [w[di, dj] for di in range(3) for dj in range(3)]  # 9 x (64,64)
    taps.append(jnp.zeros_like(taps[0]))                       # pad to 10
    packed = [jnp.concatenate([taps[2*p], taps[2*p+1]], axis=0)
              for p in range(5)]                               # (128,64)
    return jnp.stack(packed)                                   # (5,128,64)

def kernel(x_ref, w_ref, o_ref):
    # x_ref: (1, 58, 66, 64) bf16 padded; w_ref: (5,128,64); o_ref: (1,56,64,64)
    for ht in range(H // HT):
        acc = jnp.zeros((HT * WP, CO), jnp.float32)
        for p in range(5):
            t1, t2 = 2 * p, 2 * p + 1
            def tap_slice(t):
                if t >= 9:
                    return jnp.zeros((HT * WP, C), jnp.bfloat16)
                di, dj = t // 3, t % 3
                xs = x_ref[0, ht * HT + di: ht * HT + di + HT,
                           dj: dj + WP, :]
                return xs.reshape(HT * WP, C)
            a = jnp.concatenate([tap_slice(t1), tap_slice(t2)], axis=-1)
            acc += jnp.dot(a, w_ref[p], preferred_element_type=jnp.float32)
        o_ref[0, ht * HT: (ht + 1) * HT, :, :] = (
            acc.reshape(HT, WP, CO).astype(o_ref.dtype))

def conv_pallas(x, w_packed):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 9), (0, 0)))  # H 58, W 66
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, WP + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 2 * C, CO), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP, CO), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WP, CO), jnp.bfloat16),
    )(xp, w_packed)
    return out[:, :, :W, :]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((3, 3, C, CO)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
wp = pack_weights(w)

ref = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
f = jax.jit(conv_pallas)

try:
    y1 = np.asarray(ref(x, w), np.float32)[:2]
    y2 = np.asarray(f(x, wp), np.float32)[:2]
    err = np.abs(y1 - y2).max()
    log(f"pallas im2col conv max|diff| (first 2 imgs): {err:.4f} "
        f"(scale {np.abs(y1).max():.1f})")
    log(f"conv3x3 64-64@56 XLA fwd: {timeit(ref, x, w)*1e3:.2f}ms")
    log(f"conv3x3 64-64@56 pallas-packed fwd: {timeit(f, x, wp)*1e3:.2f}ms")
except Exception as e:
    log(f"pallas conv FAILED {type(e).__name__}: {str(e)[:300]}")

log("session 20 complete")
OUT.close()
