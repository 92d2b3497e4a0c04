"""Session 25: decompose the pad-sum pool backward's remaining cost.

At the RN50 stem config (3/2/1, dy 56^2x64 bf16 B=256, dx 112^2x64):
fwd+bwd is ~13.9 ms, fwd ~2.2 -> bwd ~11.7 ms vs ~1.3 ms speed-of-light
(write 411 MB + read ~620 MB at 819 GB/s). Which part is off:
  (a) placement alone: sum of 4 interior-padded planes (inputs given)
  (b) masking alone: the 9 masked+shifted m_t sums to 4 planes
  (c) full bwd (reference)
  (d) placement via jnp.zeros().at[::2,::2].set() strided scatter
  (e) a no-routing bwd: every dx element = nearest dy (pure upsample)
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench25_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu.ops import pool as pm
log(f"25 sanity {float(jnp.ones((2,2)).sum())}")


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
    return (time.perf_counter() - t0) / k * 1e3


B, HO, WO, C = 256, 56, 56, 64
H = W = 112
rng = np.random.default_rng(0)
dy = jnp.asarray(rng.standard_normal((B, HO, WO, C)), dtype=jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, 9, (B, HO, WO, C)).astype(np.uint8))
planes = [jnp.asarray(rng.standard_normal((B, HO, WO, C)),
                      dtype=jnp.bfloat16) for _ in range(4)]


@jax.jit
def placement_only(p0, p1, p2, p3):
    zero = jnp.zeros((), p0.dtype)
    out = None
    for (rr, rc), p in zip([(0, 0), (0, 1), (1, 0), (1, 1)],
                           (p0, p1, p2, p3)):
        placed = jax.lax.pad(p, zero, [
            (0, 0, 0), (rr, 1 - rr, 1), (rc, 1 - rc, 1), (0, 0, 0)])
        out = placed if out is None else out + placed
    return out


@jax.jit
def masking_only(dy_, idx_):
    outs = []
    for rr in range(2):
        rtaps = [(di, (rr + 1 - di) // 2) for di in range(3)
                 if (rr + 1 - di) % 2 == 0]
        for rc in range(2):
            ctaps = [(dj, (rc + 1 - dj) // 2) for dj in range(3)
                     if (rc + 1 - dj) % 2 == 0]
            plane = None
            for di, du in rtaps:
                for dj, dv in ctaps:
                    t = di * 3 + dj
                    m = dy_ * (idx_ == jnp.uint8(t)).astype(dy_.dtype)
                    sh = jnp.roll(m, (du, dv), axis=(1, 2))  # cost proxy
                    plane = sh if plane is None else plane + sh
            outs.append(plane)
    return outs


@jax.jit
def full_bwd(dy_, idx_):
    return pm._mp_bwd_padsum((3, 3), (2, 2), (1, 1), (B, H, W, C),
                             "bfloat16", idx_, dy_)


@jax.jit
def strided_set(p0, p1, p2, p3):
    out = jnp.zeros((B, H, W, C), p0.dtype)
    out = out.at[:, 0::2, 0::2, :].set(p0)
    out = out.at[:, 0::2, 1::2, :].set(p1)
    out = out.at[:, 1::2, 0::2, :].set(p2)
    out = out.at[:, 1::2, 1::2, :].set(p3)
    return out


@jax.jit
def upsample_nearest(dy_):
    return jnp.repeat(jnp.repeat(dy_, 2, axis=1), 2, axis=2)


log(f"(a) placement-only (4 interior pads + add): "
    f"{timeit(placement_only, *planes):6.2f} ms")
log(f"(b) masking-only (9 masked rolls -> 4 planes): "
    f"{timeit(masking_only, dy, idx):6.2f} ms")
log(f"(c) full pad-sum bwd: {timeit(full_bwd, dy, idx):6.2f} ms")
log(f"(d) strided .at[].set placement: "
    f"{timeit(strided_set, *planes):6.2f} ms")
log(f"(e) nearest upsample 2x2 (repeat): "
    f"{timeit(upsample_nearest, dy):6.2f} ms")
log("session 25 complete")
OUT.close()
