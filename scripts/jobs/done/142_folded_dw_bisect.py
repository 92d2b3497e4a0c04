"""Job 142 (round 5): folded-layout depthwise — Mosaic bisect + XLA
fold/unfold relayout cost (VERDICT r4 #3 decision data).

Job 112: folded DMA runs at 318 GB/s (vs 52 GB/s for 4D small-C),
sublane/lane-shifted taps are free — but the full 9-tap dwfold kernel
HTTP-500'd and was never bisected (job 115 bisected only the reshape
crash). Also unmeasured: what XLA charges to physically relayout
NHWC -> (B,HP,WP*C) at a pallas_call boundary and back — if that
roundtrip alone costs more than XLA's whole dw conv, the folded plan
is dead regardless of the kernel (VERDICT r4 #3's close-out clause).

Variants per shape (B=256; MNv2 dw sites 112^2 x 32 and 56^2 x 144):
  xla-dw      XLA fgc depthwise fwd (the incumbent)
  copy-pre    pallas copy, PRE-folded input (DMA sanity)
  copy-rt     XLA pad+fold -> pallas copy -> unfold+slice (relayout rt)
  dw-v0       job-112 dwfold verbatim (expected 500)
  dw-v1       weights kept 2-D: w_ref[i:i+1, :] broadcast
  dw-v2       no weights at all (9-tap sum only)
  dw-v3       equal-row blocks (in HP rows, out HP rows, slice outside)
  dw-v4       v1 + bf16 accumulation (no fp32 upcast)
Whichever dw variant compiles: parity vs XLA + fwd time, plus the
end-to-end folded pipeline (pad+fold -> dw kernel -> unfold+slice).
"""
import time as _t

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
SHAPES = [(112, 32), (56, 144)]


def bench(fn, *a, k=20):
    fetch1(fn(*a))
    fetch1(fn(*a))
    ws = []
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(k):
            out = fn(*a)
        fetch1(out)
        ws.append((_t.perf_counter() - t0) / k * 1e3)
    return sorted(ws)[1]


for H, C in SHAPES:
    W = H
    HP = ((H + 2) + 7) // 8 * 8          # padded rows, 8-multiple
    WP = W + 2
    WPC = WP * C
    x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                           jnp.bfloat16)
    wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C),
                            jnp.float32) * 0.2
    wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WPC)
    gb = x4.size * 2 * 2 / 1e9

    # --- incumbent ---
    def f_xla(x, w9):
        return jax.lax.conv_general_dilated(
            x, w9.reshape(3, 3, 1, C).astype(x.dtype), (1, 1),
            ((1, 1), (1, 1)), feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    jxla = jax.jit(f_xla)
    y_ref = jxla(x4, wd9)
    t_xla = bench(jxla, x4, wd9)
    log(f"H={H} C={C}: xla-dw {t_xla:.2f} ms ({gb/t_xla*1e3:.0f} GB/s)")

    # --- folded copy kernels ---
    def k_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    copy_call = pl.pallas_call(
        k_copy, grid=(B,),
        in_specs=[pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HP, WPC), jnp.bfloat16))

    xf = jnp.pad(x4, ((0, 0), (1, HP - H - 1), (1, 1),
                      (0, 0))).reshape(B, HP, WPC)
    t_pre = bench(jax.jit(lambda a: copy_call(a)), xf)
    log(f"H={H} C={C}: copy-pre {t_pre:.2f} ms "
        f"({xf.size*2*2/1e9/t_pre*1e3:.0f} GB/s)")

    def f_rt(x):
        xp = jnp.pad(x, ((0, 0), (1, HP - H - 1), (1, 1), (0, 0)))
        yf = copy_call(xp.reshape(B, HP, WPC))
        return yf.reshape(B, HP, WP, C)[:, 1:H + 1, 1:W + 1, :]

    t_rt = bench(jax.jit(f_rt), x4)
    log(f"H={H} C={C}: copy-rt {t_rt:.2f} ms (relayout overhead "
        f"{t_rt - t_pre:+.2f} ms vs pre; xla-dw {t_xla:.2f})")

    # --- dw variants ---
    def make_dw(variant):
        out_rows = HP if variant == "v3" else H

        def body(x_ref, w_ref, o_ref):
            acc_dtype = jnp.bfloat16 if variant == "v4" else jnp.float32
            v = x_ref[0].astype(acc_dtype)            # (HP, WPC)
            acc = None
            for di in range(3):
                rows = (v if variant == "v3"
                        else v[di:di + H, :])
                for dj in range(3):
                    if dj == 0:
                        sh = rows
                    else:
                        sh = jnp.concatenate(
                            [rows[:, dj * C:],
                             jnp.zeros((rows.shape[0], dj * C),
                                       acc_dtype)], axis=1)
                    if variant == "v2":
                        t = sh
                    elif variant == "v0":
                        t = sh * w_ref[3 * di + dj][None, :].astype(acc_dtype)
                    else:
                        t = sh * w_ref[3 * di + dj:3 * di + dj + 1,
                                       :].astype(acc_dtype)
                    if variant == "v3" and di:
                        t = pltpu.roll(t, HP - di, 0)
                    acc = t if acc is None else acc + t
            o_ref[0] = acc.astype(o_ref.dtype)

        return pl.pallas_call(
            body, grid=(B,),
            in_specs=[
                pl.BlockSpec((1, HP, WPC), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, WPC), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, out_rows, WPC), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, out_rows, WPC),
                                           jnp.bfloat16))

    winner = None
    for var in ("v0", "v1", "v2", "v3", "v4"):
        try:
            call = make_dw(var)
            f = jax.jit(lambda a, w: call(a, w))
            out = f(xf, wrows)
            fetch1(out)
            t = bench(f, xf, wrows)
            note = ""
            if var not in ("v2", "v3"):
                yk = out.reshape(B, H, WP, C)[:, :, 1:W + 1, :]
                err = float(jnp.max(jnp.abs(
                    yk.astype(jnp.float32)
                    - y_ref.astype(jnp.float32))))
                note = f" err {err:.4f}"
                if winner is None:
                    winner = var
            log(f"H={H} C={C}: dw-{var} {t:.2f} ms{note}")
        except Exception as e:
            log(f"H={H} C={C}: dw-{var} FAILED {type(e).__name__}: "
                + str(e)[:120])

    # --- end-to-end folded dw pipeline (if any parity variant lives) --
    if winner:
        call = make_dw(winner)

        def f_e2e(x, w):
            xp = jnp.pad(x, ((0, 0), (1, HP - H - 1), (1, 1), (0, 0)))
            yf = call(xp.reshape(B, HP, WPC), w)
            return yf.reshape(B, H, WP, C)[:, :, 1:W + 1, :]

        t_e2e = bench(jax.jit(f_e2e), x4, wrows)
        log(f"H={H} C={C}: E2E folded dw ({winner}) {t_e2e:.2f} ms vs "
            f"xla-dw {t_xla:.2f} ({t_xla/t_e2e:.2f}x)")
