"""Job 134 (round 5): grouped conv as C/128 INDEPENDENT dense 128->128
convs with block-diagonal-masked weights ("tiled dense") — A/B vs
feature_group_count at every ResNeXt-50 grouped shape, fwd+bwd.

Why: job 103 showed the grouped lowering (groups as a stride-31 spatial
dim) runs at ~25% of its bytes floor; job 105's full-dense-masked
reformulation wins only at C=128 (1.13x) because dense costs g x the
grouped FLOPs. The tiled form costs only 128/cg x grouped FLOPs
(cg=4..32 -> 32x..4x) while keeping every matmul a dense 128-lane MXU
op: split C into T=C/128 tiles; group i never straddles a tile boundary
(cg divides 128), so tile t's outputs depend only on tile t's inputs.
Two lowering variants: T separate conv calls (slice/concat) and one
feature_group_count=T call with masked dense weights.
"""
import functools

from jax import lax

B = 256
# (H_in, C, g, stride) — every distinct grouped-conv site in ResNeXt-50
SHAPES = [
    (56, 128, 32, 1),
    (56, 256, 32, 2),
    (28, 256, 32, 1),
    (28, 512, 32, 2),
    (14, 512, 32, 1),
    (14, 1024, 32, 2),
    (7, 1024, 32, 1),
]
DIMS = ("NHWC", "HWIO", "NHWC")


def dense_tiles(wg, C, g):
    """grouped HWIO weight (3,3,cg,C) -> (T,3,3,128,128) block-diag
    dense tiles (off-block entries zero)."""
    cg = C // g
    T = C // 128
    gpt = 128 // cg
    # out channels factor as (T, gpt, cg); in channels of group (t,j)
    # are tile t, lanes j*cg:(j+1)*cg
    wr = wg.reshape(3, 3, cg, T, gpt, cg)      # (h,w,ci,t,jo,co)
    wr3 = wr.transpose(3, 0, 1, 2, 4, 5)       # (t,h,w,ci,jo,co)
    eye = jnp.eye(gpt, dtype=wg.dtype)         # (ji,jo)
    wd = (wr3[:, :, :, None, :, :, :]
          * eye[None, None, None, :, None, :, None])  # (t,h,w,ji,ci,jo,co)
    return wd.reshape(T, 3, 3, 128, 128)


for H, C, g, s in SHAPES:
    cg = C // g
    T = C // 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
    wg = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, C),
                           jnp.bfloat16) * 0.05

    def f_grouped(x, w):
        y = lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=g,
            dimension_numbers=DIMS)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def f_tiled(x, w):
        wd = dense_tiles(w, C, g)
        ys = [lax.conv_general_dilated(
            lax.slice_in_dim(x, t * 128, (t + 1) * 128, axis=3), wd[t],
            (s, s), ((1, 1), (1, 1)), dimension_numbers=DIMS)
            for t in range(T)]
        y = jnp.concatenate(ys, axis=-1) if T > 1 else ys[0]
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def f_fgc128(x, w):
        wd = dense_tiles(w, C, g)                      # (T,3,3,128,128)
        wf = wd.transpose(1, 2, 3, 0, 4).reshape(3, 3, 128, C)
        y = lax.conv_general_dilated(
            x, wf, (s, s), ((1, 1), (1, 1)), feature_group_count=T,
            dimension_numbers=DIMS)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(f_grouped, argnums=(0, 1)))
    tf_ = jax.jit(jax.grad(f_tiled, argnums=(0, 1)))
    ff = jax.jit(jax.grad(f_fgc128, argnums=(0, 1)))

    dxg, dwg_ = gf(x, wg)
    dxt, dwt_ = tf_(x, wg)
    errx = float(jnp.max(jnp.abs(dxg.astype(jnp.float32)
                                 - dxt.astype(jnp.float32))))
    errw = float(jnp.max(jnp.abs(dwg_.astype(jnp.float32)
                                 - dwt_.astype(jnp.float32))))
    t_g = timeit(gf, x, wg, k=10)
    t_t = timeit(tf_, x, wg, k=10)
    try:
        t_f = timeit(ff, x, wg, k=10)
    except Exception as e:  # noqa: BLE001
        t_f = float("nan")
        log(f"fgc128 failed: {type(e).__name__}: {str(e)[:100]}")
    log(f"H={H} C={C} s={s} (cg={cg},T={T}): grouped {t_g:.2f} ms | "
        f"tiled {t_t:.2f} ({t_g/t_t:.2f}x) | fgc128 {t_f:.2f} "
        f"({t_g/t_f:.2f}x) | dx err {errx:.5f} dw err {errw:.5f}")
