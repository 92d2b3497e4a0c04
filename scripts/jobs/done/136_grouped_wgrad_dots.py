"""Job 136 (round 5): hybrid grouped conv — fgc forward + fgc dgrad,
but WGRAD as per-tap diag-tile batched dots.

Job 103's trace splits ResNeXt grouped time ~half fwd/dgrad (b012f
outputs) and ~half wgrad (f012b->01b2f weight-shaped outputs, e.g.
11.10 ms x16 at 28^2). The wgrad contraction per tap is
x_tap^T @ dy over batch*space; restricted to the T=C/128 diagonal
128x128 tiles it is a dense MXU batched matmul at 128/cg x grouped
FLOPs — off-block products are discarded by the block-diag extraction
(exact grouped wgrad). Measures fwd+bwd time vs pure fgc, plus fp32
parity of dw.
"""
import functools

from jax import lax

B = 256
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


def make_hybrid(C, g, s):
    cg = C // g
    T = C // 128

    def fwd_conv(x, w):
        return lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=g,
            dimension_numbers=DIMS)

    @jax.custom_vjp
    def f(x, w):
        return fwd_conv(x, w)

    def fwd(x, w):
        return fwd_conv(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        _, pull = jax.vjp(lambda x_: fwd_conv(x_, w), x)
        dx, = pull(dy)
        n, ho, wo, _ = dy.shape
        dyf = dy.reshape(n * ho * wo, T, 128)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for di in range(3):
            for dj in range(3):
                patch = lax.slice(
                    xp, (0, di, dj, 0),
                    (n, di + (ho - 1) * s + 1, dj + (wo - 1) * s + 1, C),
                    (1, s, s, 1))
                tile = jnp.einsum(
                    "nti,nto->tio",
                    patch.reshape(n * ho * wo, T, 128), dyf,
                    preferred_element_type=jnp.float32)
                gpt = 128 // cg
                t5 = tile.reshape(T, gpt, cg, gpt, cg)
                diag = jnp.einsum("tacad->tacd", t5)   # (T,gpt,cg_i,cg_o)
                taps.append(diag.transpose(2, 0, 1, 3).reshape(cg, C))
        dw = jnp.stack(taps).reshape(3, 3, cg, C).astype(w.dtype)
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


for H, C, g, s in SHAPES:
    cg = C // g
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    wg = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, C),
                           jnp.bfloat16) * 0.05
    hyb = make_hybrid(C, g, s)

    def f_fgc(x, w):
        y = lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=g,
            dimension_numbers=DIMS)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def f_hyb(x, w):
        return jnp.sum(hyb(x, w).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(f_fgc, argnums=(0, 1)))
    hf = jax.jit(jax.grad(f_hyb, argnums=(0, 1)))
    dxg, dwg_ = gf(x, wg)
    dxh, dwh_ = hf(x, wg)
    # relative dw parity in fp32 (bf16 accumulations over 800k terms)
    a = dwg_.astype(jnp.float32)
    b = dwh_.astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1.0)))
    t_g = timeit(gf, x, wg, k=10)
    t_h = timeit(hf, x, wg, k=10)
    log(f"H={H} C={C} s={s} (cg={cg},T={C//128}): fgc {t_g:.2f} ms | "
        f"hybrid-wgrad-dots {t_h:.2f} ({t_g/t_h:.2f}x) | dw relerr {rel:.4f}")
