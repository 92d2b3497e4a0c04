"""Job 106 (round 4): fused-MBConv kernel ablation — find the cost
center at the shapes where the kernel loses (H=112, H=56; job 104).

Variants (self-contained builder, production file untouched):
  full      - 9 static slices (baseline, = ops/pallas/mbconv.py)
  nomask    - drop the padding where-mask
  rowtaps   - 3 taps di only (no W/sublane-shifted slices)
  djroll    - dj shifts via 3 pltpu.roll on W, taps then row-sliced
  djhoist   - dj shifts hoisted: 3 sliced copies reused by 3 di each
  nodw      - skip the depthwise entirely (matmuls + IO floor)
  bigchunk  - full with chunk cap 56 instead of 28
"""
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256


def chunk_of(n, cap):
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def build(h, w, cin, ch, cout, variant, cap=28, dtype=jnp.bfloat16):
    wp = w + 2
    chunk = chunk_of(h, 56 if variant == "bigchunk" else cap)
    n_chunks = h // chunk

    def body(xp_ref, xc_ref, xn_ref, we_ref, s1_ref, t1_ref, wd_ref,
             s2_ref, t2_ref, wpj_ref, s3_ref, t3_ref, out_ref):
        j = pl.program_id(1)
        xw = jnp.concatenate(
            [xp_ref[0][chunk - 1:chunk], xc_ref[0], xn_ref[0][0:1]], axis=0)
        hmat = jnp.dot(xw.reshape((chunk + 2) * wp, cin), we_ref[:],
                       preferred_element_type=jnp.float32)
        hmat = hmat * s1_ref[:] + t1_ref[:]
        hmat = jnp.clip(hmat, 0.0, 6.0).reshape(chunk + 2, wp, ch)
        if variant != "nomask":
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 1)
            grow = rows + j * chunk - 1
            mask = ((grow >= 0) & (grow < h) & (cols >= 1) & (cols <= wp - 2))
            hmat = jnp.where(mask, hmat, 0.0)
        if variant == "nodw":
            acc = hmat[1:1 + chunk, 1:1 + w, :]
        elif variant == "rowtaps":
            acc = None
            for di in range(3):
                t = hmat[di:di + chunk, 1:1 + w, :] * wd_ref[3 * di + 1][None, None, :]
                acc = t if acc is None else acc + t
        elif variant == "djroll":
            acc = None
            for dj in range(3):
                shifted = pltpu.roll(hmat, -dj, 1) if dj else hmat
                for di in range(3):
                    t = (shifted[di:di + chunk, 0:w, :]
                         * wd_ref[3 * di + dj][None, None, :])
                    acc = t if acc is None else acc + t
        elif variant == "djhoist":
            acc = None
            for dj in range(3):
                colslab = hmat[:, dj:dj + w, :]
                for di in range(3):
                    t = (colslab[di:di + chunk]
                         * wd_ref[3 * di + dj][None, None, :])
                    acc = t if acc is None else acc + t
        else:  # full / nomask / bigchunk
            acc = None
            for di in range(3):
                for dj in range(3):
                    t = (hmat[di:di + chunk, dj:dj + w, :]
                         * wd_ref[3 * di + dj][None, None, :])
                    acc = t if acc is None else acc + t
        u2 = jnp.clip(acc * s2_ref[:][None] + t2_ref[:][None], 0.0, 6.0)
        y = jnp.dot(u2.reshape(chunk * w, ch).astype(dtype), wpj_ref[:],
                    preferred_element_type=jnp.float32)
        y = y * s3_ref[:] + t3_ref[:]
        out_ref[0] = y.reshape(chunk, w, cout).astype(out_ref.dtype)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, chunk, wp, cin),
                     lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, wp, cin), lambda b, j: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, wp, cin),
                     lambda b, j: (b, jnp.minimum(j + 1, n_chunks - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        wspec((cin, ch)), wspec((1, ch)), wspec((1, ch)),
        wspec((9, ch)), wspec((1, ch)), wspec((1, ch)),
        wspec((ch, cout)), wspec((1, cout)), wspec((1, cout)),
    ]
    return pl.pallas_call(
        body, grid=(B, n_chunks), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, chunk, w, cout),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w, cout), dtype),
    ), chunk


SHAPES = [(112, 32, 32, 16), (56, 24, 144, 24), (14, 96, 576, 96),
          (7, 160, 960, 160)]
VARIANTS = ["full", "nomask", "rowtaps", "djroll", "djhoist", "nodw",
            "bigchunk"]

for (h, cin, ch, cout) in SHAPES:
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (B, h, h + 2, cin), jnp.bfloat16)
    we = jax.random.normal(ks[1], (cin, ch), jnp.bfloat16) * 0.2
    wd9 = jax.random.normal(ks[2], (9, ch), jnp.float32) * 0.2
    wpj = jax.random.normal(ks[3], (ch, cout), jnp.bfloat16) * 0.2
    s1 = jnp.ones((1, ch), jnp.float32)
    t1 = jnp.zeros((1, ch), jnp.float32)
    s2 = jnp.ones((1, ch), jnp.float32)
    t2 = jnp.zeros((1, ch), jnp.float32)
    s3 = jnp.ones((1, cout), jnp.float32)
    t3 = jnp.zeros((1, cout), jnp.float32)
    base = None
    for v in VARIANTS:
        try:
            call, chunk = build(h, h, cin, ch, cout, v)
            f = jax.jit(lambda *a: call(*a))
            args = (x, x, x, we, s1, t1, wd9, s2, t2, wpj, s3, t3)
            out = f(*args)
            t = timeit(f, *args, k=20)
            if v == "full":
                base = out
                ref = None
            note = ""
            if base is not None and v in ("djroll", "djhoist", "bigchunk"):
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - base.astype(jnp.float32))))
                note = f"  maxerr-vs-full {err:.5f}"
            log(f"H={h} {cin}->{ch}->{cout} {v:9s} chunk={chunk}: "
                f"{t:.3f} ms{note}")
        except Exception as e:
            log(f"H={h} {cin}->{ch}->{cout} {v:9s}: FAILED "
                f"{type(e).__name__}: {str(e)[:180]}")
