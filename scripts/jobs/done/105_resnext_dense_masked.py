"""Job 105 (round 4): grouped conv as DENSE conv with a block-diagonal
weight mask — A/B vs feature_group_count at ResNeXt-50 block shapes.

Job 103: the grouped lowering (groups as a stride-31 spatial dim) runs
at ~25% of its own bytes floor and neither batched-dot reformulation
helps. The MXU does dense FLOPs 'for free' at these MFUs: a dense conv
with w*mask is mathematically identical (masked positions contribute
0; their wgrads are killed by the mask's chain rule), costs g x the
FLOPs but uses the fast dense conv emitter.
"""
import numpy as np_

B = 256
SHAPES = [(56, 128, 32), (28, 256, 32), (14, 512, 32), (7, 1024, 32)]


def block_mask(c, g):
    cg = c // g
    m = np_.zeros((3, 3, c, c), np_.float32)
    for i in range(g):
        m[:, :, i * cg:(i + 1) * cg, i * cg:(i + 1) * cg] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


for H, C, g in SHAPES:
    cg = C // g
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    wg = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, C),
                           jnp.bfloat16) * 0.05
    mask = block_mask(C, g)
    # dense weight holding the same values: scatter group blocks
    wd = np_.zeros((3, 3, C, C), np_.float32)
    wgn = np_.asarray(wg, np_.float32)
    for i in range(g):
        wd[:, :, i * cg:(i + 1) * cg, i * cg:(i + 1) * cg] = \
            wgn[:, :, :, i * cg:(i + 1) * cg]
    wd = jnp.asarray(wd, jnp.bfloat16)

    def f_grouped(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def f_dense(x, w):
        y = jax.lax.conv_general_dilated(
            x, w * mask, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(f_grouped, argnums=(0, 1)))
    df = jax.jit(jax.grad(f_dense, argnums=(0, 1)))
    # parity: dense-masked grads equal grouped grads (dw: dense slice)
    dxg, dwg_ = gf(x, wg)
    dxd, dwd_ = df(x, wd)
    err = float(jnp.max(jnp.abs(dxg.astype(jnp.float32)
                                - dxd.astype(jnp.float32))))
    t_g = timeit(gf, x, wg, k=10)
    t_d = timeit(df, x, wd, k=10)
    log(f"H={H} C={C} g={g}: grouped {t_g:.2f} ms vs dense-masked "
        f"{t_d:.2f} ms ({t_g/t_d:.2f}x)  dx maxerr {err:.5f}")
