"""Job 107 (round 4): isolate the fused-MBConv cost center at large
spatial shapes — the hypothesis is the (rows, W, C) <-> (rows*W, C)
reshapes around the MXU matmuls force full relayouts.

Variants at H=112 no-expand (32->32->16, job 104's worst: 12.9 ms vs
2.5 XLA) and H=56 (24->144->24):
  reshape   - baseline: flatten to 2D around each dot (= mbconv.py)
  dot3d     - jax.lax.dot_general with 3D lhs, contract minor dim
  rowloop   - per-row 2D matmuls (static python loop over rows)
  noio      - no matmuls at all (copy center): DMA+concat+mask floor
Also re-tries H=7 960ch variants to bisect the Mosaic HTTP 500.
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256


def chunk_of(n, cap):
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def build(h, w, cin, ch, cout, has_expand, variant, cap=28,
          dtype=jnp.bfloat16):
    wp = w + 2
    chunk = chunk_of(h, cap)
    n_chunks = h // chunk

    def mm(v3, wmat, n_out):
        """(R, Wp|W, Cin) x (Cin, N) -> (R, *, N) in fp32."""
        r, cols, k = v3.shape
        if variant == "dot3d":
            return jax.lax.dot_general(
                v3, wmat, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if variant == "rowloop":
            rows = [jnp.dot(v3[i], wmat, preferred_element_type=jnp.float32)
                    for i in range(r)]
            return jnp.stack(rows, axis=0)
        out = jnp.dot(v3.reshape(r * cols, k), wmat,
                      preferred_element_type=jnp.float32)
        return out.reshape(r, cols, n_out)

    def body(xp_ref, xc_ref, xn_ref, we_ref, wd_ref, wpj_ref, out_ref):
        j = pl.program_id(1)
        xw = jnp.concatenate(
            [xp_ref[0][chunk - 1:chunk], xc_ref[0], xn_ref[0][0:1]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk + 2, wp, 1), 1)
        grow = rows + j * chunk - 1
        mask = ((grow >= 0) & (grow < h) & (cols >= 1) & (cols <= wp - 2))
        if variant == "noio":
            out_ref[0] = (xw[1:1 + chunk, 1:1 + w, :cout]
                          .astype(out_ref.dtype))
            return
        if has_expand:
            u1 = mm(xw, we_ref[:], ch)
            u1 = jnp.where(mask, jnp.clip(u1, 0.0, 6.0), 0.0)
        else:
            u1 = jnp.where(mask, xw.astype(jnp.float32), 0.0)
        acc = None
        for di in range(3):
            for dj in range(3):
                t = (u1[di:di + chunk, dj:dj + w, :]
                     * wd_ref[3 * di + dj][None, None, :])
                acc = t if acc is None else acc + t
        u2 = jnp.clip(acc, 0.0, 6.0)
        y = mm(u2.astype(dtype), wpj_ref[:], cout)
        out_ref[0] = y.astype(out_ref.dtype)

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
        wspec((cin, ch)), wspec((9, ch)), wspec((ch, cout)),
    ]
    return pl.pallas_call(
        body, grid=(B, n_chunks), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, chunk, w, cout),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w, cout), dtype),
    )


CASES = [
    (112, 32, 32, 16, False),
    (56, 24, 144, 24, True),
    (14, 96, 576, 96, True),
    (7, 160, 960, 160, True),
]
for (h, cin, ch, cout, has_expand) in CASES:
    x = jax.random.normal(jax.random.PRNGKey(0), (B, h, h + 2, cin),
                          jnp.bfloat16)
    we = jax.random.normal(jax.random.PRNGKey(1), (cin, ch),
                           jnp.bfloat16) * 0.2
    wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, ch),
                            jnp.float32) * 0.2
    wpj = jax.random.normal(jax.random.PRNGKey(3), (ch, cout),
                            jnp.bfloat16) * 0.2
    base = None
    for v in ["reshape", "dot3d", "rowloop", "noio"]:
        try:
            call = build(h, h, cin, ch, cout, has_expand, v)
            f = jax.jit(lambda *a: call(*a))
            args = (x, x, x, we, wd9, wpj)
            out = f(*args)
            t = timeit(f, *args, k=20)
            note = ""
            if v == "reshape":
                base = out
            elif base is not None and v != "noio":
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - base.astype(jnp.float32))))
                note = f"  maxerr-vs-reshape {err:.5f}"
            log(f"H={h} {cin}->{ch}->{cout} {v:8s}: {t:.3f} ms{note}")
        except Exception as e:
            log(f"H={h} {cin}->{ch}->{cout} {v:8s}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")
