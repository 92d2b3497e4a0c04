"""Job 138 (round 5, VERDICT r4 #3): depthwise conv on the
BATCH-PACKED layout — (B,H,W,C) -> (B/4, H, W, 4C) so the minor dim is
a full 128 lanes at MNv2's small-C early stages.

Why: the measured wall for every folded-layout kernel was the Mosaic
lane-split crash / 52 GB/s small-minor-dim DMA (jobs 108/112/114/115).
Packing 128//C images into the lane dimension is packing-TRANSPARENT
for depthwise (taps shift H/W only): the existing Pallas depthwise
kernel runs unchanged with tiled weights, and XLA's own fgc lowering
gets a 128-lane operand. Pack/unpack are XLA transposes measured
separately (the model-level plan keeps whole stages packed, turning
1x1 convs into diag-tile dense matmuls, so pack cost amortizes).

Arms per MNv2 depthwise site (fwd and fwd+bwd, bf16, B=256):
  fgc      XLA feature_group_count on the original layout (baseline)
  fgcP     XLA fgc on packed layout (kernel only; pack outside timer)
  palP     Pallas depthwise on packed layout
  pack     the pack+unpack transpose pair alone
"""
from jax import lax

from convnet_tpu.ops.pallas.depthwise import depthwise_conv_pallas

B = 256
# (H, C, stride) — MNv2 width-1.0 depthwise sites with C < 128
SHAPES = [
    (112, 32, 1),
    (112, 96, 2),
    (56, 144, 1),
    (56, 144, 2),
]
DIMS = ("NHWC", "HWIO", "NHWC")


def pack(x, k):
    b, h, w, c = x.shape
    return (x.reshape(b // k, k, h, w, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b // k, h, w, k * c))


def unpack(y, k):
    bk, h, w, kc = y.shape
    return (y.reshape(bk, h, w, k, kc // k)
            .transpose(0, 3, 1, 2, 4)
            .reshape(bk * k, h, w, kc // k))


import math

for H, C, s in SHAPES:
    k = math.lcm(C, 128) // C          # packed channels hit a full tile

    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, C),
                          jnp.bfloat16) * 0.2
    wk = jnp.tile(w, (1, 1, 1, k))
    xp = jax.jit(lambda x: pack(x, k))(x)

    def f_fgc(x, w):
        return lax.conv_general_dilated(
            x, w, (s, s), ((1, 1), (1, 1)), feature_group_count=x.shape[-1],
            dimension_numbers=DIMS)

    def g_fgc(x, w):
        return jnp.sum(f_fgc(x, w).astype(jnp.float32) ** 2)

    def f_pal(x, w):
        return depthwise_conv_pallas(x, w, stride=s, padding=1)

    def g_pal(x, w):
        return jnp.sum(f_pal(x, w).astype(jnp.float32) ** 2)

    roundtrip = jax.jit(lambda x: unpack(pack(x, k), k) + 0.0)

    j_fgc = jax.jit(f_fgc)
    j_fgcP = jax.jit(f_fgc)
    j_palP = jax.jit(f_pal)
    y0 = j_fgc(x, w)
    yP = unpack(j_fgcP(xp, wk), k)
    try:
        yL = unpack(j_palP(xp, wk), k)
        e_pal = float(jnp.max(jnp.abs(yL.astype(jnp.float32)
                                      - y0.astype(jnp.float32))))
    except Exception as e:  # noqa: BLE001
        yL, e_pal = None, float("nan")
        log(f"H={H} C={C} s={s}: pallas-packed FAILED "
            f"{type(e).__name__}: {str(e)[:120]}")
    e_fgcP = float(jnp.max(jnp.abs(yP.astype(jnp.float32)
                                   - y0.astype(jnp.float32))))
    t_fgc = timeit(j_fgc, x, w, k=20)
    t_fgcP = timeit(j_fgcP, xp, wk, k=20)
    t_pack = timeit(roundtrip, x, k=20)
    parts = [f"H={H} C={C} s={s} k={k}: fwd fgc {t_fgc:.2f}",
             f"fgc-packed {t_fgcP:.2f} ({t_fgc/t_fgcP:.2f}x)"]
    if yL is not None:
        t_palP = timeit(j_palP, xp, wk, k=20)
        parts.append(f"pallas-packed {t_palP:.2f} ({t_fgc/t_palP:.2f}x)")
    parts.append(f"pack+unpack {t_pack:.2f}")
    parts.append(f"err fgcP {e_fgcP:.4f} palP {e_pal:.4f}")
    log(" | ".join(parts))

    # fwd+bwd on the two principal arms
    gb = jax.jit(jax.grad(g_fgc, argnums=(0, 1)))
    t_gb = timeit(gb, x, w, k=10)
    line = f"H={H} C={C} s={s}: fwd+bwd fgc {t_gb:.2f}"
    gbP = jax.jit(jax.grad(g_fgc, argnums=(0, 1)))
    t_gbP = timeit(gbP, xp, wk, k=10)
    line += f" | fgc-packed {t_gbP:.2f} ({t_gb/t_gbP:.2f}x)"
    if yL is not None:
        try:
            gpP = jax.jit(jax.grad(g_pal, argnums=(0, 1)))
            t_gpP = timeit(gpP, xp, wk, k=10)
            line += f" | pallas-packed {t_gpP:.2f} ({t_gb/t_gpP:.2f}x)"
        except Exception as e:  # noqa: BLE001
            line += f" | pallas bwd FAILED {type(e).__name__}"
    log(line)
