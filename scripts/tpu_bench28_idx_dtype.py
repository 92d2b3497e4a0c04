"""Session 28: does storing the max-pool winning-tap index in bf16
(same (16,128) tile shape as dy) beat u8 (32,128) in the pad-sum
backward? The mask compute `dy * (idx == t)` crosses tile shapes with
u8; with bf16 idx the compare+select stays in one layout. Residual is
2x the idx HBM traffic. Measures standalone bwd + full RN50/GoogLeNet
steps with a patched index dtype.
"""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench28_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
from convnet_tpu.ops import pool as pm
log(f"28 sanity {float(jnp.ones((2,2)).sum())}")


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


B, HO, WO, C = 256, 56, 56, 64
rng = np.random.default_rng(0)
dy = jnp.asarray(rng.standard_normal((B, HO, WO, C)), dtype=jnp.bfloat16)
idx_np = rng.integers(0, 9, (B, HO, WO, C))
shape = (B, 112, 112, C)


def mk_bwd(idx_dtype):
    idx = jnp.asarray(idx_np.astype(np.uint8))
    if idx_dtype != jnp.uint8:
        idx = idx.astype(idx_dtype)

    def bwd(dy_, idx_):
        # inline copy of _mp_bwd_padsum's loop with dtype-generic taps
        kh = kw = 3; sh = sw = 2; ph = pw = 1
        b, h, w, c = shape

        def _shift2(m, du, dv, n_h, n_w):
            pad = [(0, 0)] * 4
            start = [0, 0, 0, 0]
            for axis, (d, n) in (((1, (du, n_h))), (2, (dv, n_w))):
                lo = max(0, -d)
                hi = max(0, n + d - m.shape[axis])
                pad[axis] = (lo, hi)
                start[axis] = d + lo
            mp_ = jnp.pad(m, pad)
            return jax.lax.slice(
                mp_, start, [start[0] + m.shape[0], start[1] + n_h,
                             start[2] + n_w, start[3] + m.shape[3]])

        dx = None
        for rr in range(sh):
            rtaps = [(di, (rr + ph - di) // sh) for di in range(kh)
                     if (rr + ph - di) % sh == 0]
            n_h = (h - rr + sh - 1) // sh
            for rc in range(sw):
                ctaps = [(dj, (rc + pw - dj) // sw) for dj in range(kw)
                         if (rc + pw - dj) % sw == 0]
                n_w = (w - rc + sw - 1) // sw
                plane = None
                for di, du in rtaps:
                    for dj, dv in ctaps:
                        t = di * kw + dj
                        m = dy_ * (idx_ == idx_.dtype.type(t)).astype(
                            dy_.dtype)
                        m = _shift2(m, du, dv, n_h, n_w)
                        plane = m if plane is None else plane + m
                if dx is None:
                    dx = jnp.zeros((b, h, w, c), dy_.dtype)
                dx = dx.at[:, rr::sh, rc::sw, :].set(plane)
        return dx

    return jax.jit(bwd), idx


for dt, name in [(jnp.uint8, "u8"), (jnp.bfloat16, "bf16"),
                 (jnp.int32, "i32"), (jnp.float32, "f32")]:
    f, idx = mk_bwd(dt)
    log(f"padsum bwd idx={name}: {timeit(f, dy, idx):6.2f} ms")
log("session 28 complete")
OUT.close()
