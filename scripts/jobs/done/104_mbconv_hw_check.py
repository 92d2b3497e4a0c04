"""Job 104 (round 4): fused MBConv kernel — hardware compile check,
parity on-chip, standalone timing vs the unfused XLA composition at
every stride-1 MobileNet-V2 block shape (B=256, bf16).

Go/no-go gate for the fused inverted-residual campaign: Mosaic must
compile the kernel and the fused eval forward must beat the unfused
3-conv chain (it reads/writes only Cin/Cout-sized tensors instead of
round-tripping the 6x hidden ones).
"""
import numpy as np_
from convnet_tpu.ops.pallas import mbconv

B = 256
# (H, Cin, Ch, Cout, residual, has_expand)  - MNv2 stride-1 blocks
SHAPES = [
    (112, 32, 32, 16, False, False),   # t=1 stem block
    (56, 24, 144, 24, True, True),
    (28, 32, 192, 32, True, True),
    (14, 64, 384, 64, True, True),
    (14, 64, 384, 96, False, True),    # stage 5 entry (s=1)
    (14, 96, 576, 96, True, True),
    (7, 160, 960, 160, True, True),
    (7, 160, 960, 320, False, True),
]

key = jax.random.PRNGKey(0)


def mk(h, cin, ch, cout, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (B, h, h, cin), dtype)
    we = jax.random.normal(ks[1], (cin, ch), dtype) * 0.2
    wd = jax.random.normal(ks[2], (3, 3, 1, ch), dtype) * 0.2
    wpj = jax.random.normal(ks[3], (ch, cout), dtype) * 0.2
    s1, s2 = [jax.random.normal(k, (ch,), jnp.float32) * 0.1 + 1.0
              for k in ks[4:6]]
    t1, t2 = [jax.random.normal(k, (ch,), jnp.float32) * 0.1
              for k in ks[6:8]]
    s3 = jax.random.normal(ks[8], (cout,), jnp.float32) * 0.1 + 1.0
    t3 = jax.random.normal(ks[9], (cout,), jnp.float32) * 0.1
    return x, we, wd, wpj, s1, t1, s2, t2, s3, t3


def ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, residual):
    v = x
    ch = wd.shape[-1]
    if we is not None:
        v = jnp.einsum("bhwc,cd->bhwd", v, we,
                       preferred_element_type=jnp.float32)
        v = jnp.clip(v * s1 + t1, 0.0, 6.0).astype(x.dtype)
    h2 = jax.lax.conv_general_dilated(
        v, wd, (1, 1), ((1, 1), (1, 1)), feature_group_count=ch,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    u2 = jnp.clip(h2 * s2 + t2, 0.0, 6.0).astype(x.dtype)
    y = jnp.einsum("bhwc,cd->bhwd", u2, wpj,
                   preferred_element_type=jnp.float32)
    y = y * s3 + t3
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)


for (h, cin, ch, cout, residual, has_expand) in SHAPES:
    x, we, wd, wpj, s1, t1, s2, t2, s3, t3 = mk(h, cin, ch, cout)
    if has_expand:
        f_fused = jax.jit(lambda x, we, s1, t1, wd, s2, t2, wpj, s3, t3:
                          mbconv.mbconv_infer(x, we, s1, t1, wd, s2, t2,
                                              wpj, s3, t3,
                                              residual=residual))
        f_ref = jax.jit(lambda x, we, s1, t1, wd, s2, t2, wpj, s3, t3:
                        ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3,
                                  t3, residual))
        args = (x, we, s1, t1, wd, s2, t2, wpj, s3, t3)
    else:
        f_fused = jax.jit(lambda x, wd, s2, t2, wpj, s3, t3:
                          mbconv.mbconv_infer(x, None, None, None, wd,
                                              s2, t2, wpj, s3, t3,
                                              residual=residual))
        f_ref = jax.jit(lambda x, wd, s2, t2, wpj, s3, t3:
                        ref_infer(x, None, None, None, wd, s2, t2, wpj,
                                  s3, t3, residual))
        args = (x, wd, s2, t2, wpj, s3, t3)
    tag = f"H={h} {cin}->{ch}->{cout} res={int(residual)}"
    try:
        got = f_fused(*args)
        want = f_ref(*args)
        g32 = got.astype(jnp.float32)
        w32 = want.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(g32 - w32)))
        scale = float(jnp.max(jnp.abs(w32))) or 1.0
        t_f = timeit(f_fused, *args, k=20)
        t_r = timeit(f_ref, *args, k=20)
        log(f"{tag}: fused {t_f:.3f} ms vs xla {t_r:.3f} ms "
            f"({t_r/t_f:.2f}x)  maxerr {err:.4f} (rel {err/scale:.4f})")
    except Exception as e:
        import traceback
        log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")

# --- training forward (stats + raw kernels) at one big shape ---
for (h, cin, ch, cout, residual, has_expand) in [(56, 24, 144, 24, True, True),
                                                 (14, 96, 576, 96, True, True)]:
    x, we, wd, wpj, g1, b1, g2, b2, g3, b3 = mk(h, cin, ch, cout)

    def f_train(x, we, g1, b1, wd, g2, b2, wpj, g3, b3):
        out, stats = mbconv.mbconv_train_forward(
            x, we, g1, b1, wd, g2, b2, wpj, g3, b3, residual=residual)
        return out

    def f_train_ref(x, we, g1, b1, wd, g2, b2, wpj, g3, b3):
        return mbconv._unfused(x, we, g1, b1, wd, g2, b2, wpj, g3, b3,
                               eps=1e-5, residual=residual,
                               act_mid="relu6", act_out="none",
                               axis_name=None)

    args = (x, we, g1, b1, wd, g2, b2, wpj, g3, b3)
    tag = f"TRAIN-FWD H={h} {cin}->{ch}->{cout}"
    try:
        jf = jax.jit(f_train)
        jr = jax.jit(f_train_ref)
        got, want = jf(*args), jr(*args)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
        t_f = timeit(jf, *args, k=20)
        t_r = timeit(jr, *args, k=20)
        log(f"{tag}: fused {t_f:.3f} ms vs xla {t_r:.3f} ms "
            f"({t_r/t_f:.2f}x)  maxerr {err:.4f} (rel {err/scale:.4f})")
    except Exception as e:
        log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")
