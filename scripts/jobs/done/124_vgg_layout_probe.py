"""Job 124 (round 4, rerun): VGG early-stage layout probe — is
channels-first (or any user-space layout) faster for the C=64/128
high-resolution convs that job 123 attributed as VGG-16's whole
emitter gap?

Job 123: 103.4 of 107.9 ms is pure conv; the 224^2x64 and 112^2x128
triples run far from their FLOP floors because C=64/128 fills only
half/one 128-lane tile. PERF_NOTES names "layout-native model variants
(channels-first early stages)" as the only conceivable play. This job
measures it: the SAME conv math under NHWC vs NCHW dimension numbers
(XLA picks physical layouts per logical spec), fwd and fwd+bwd, vs
each shape's own FLOP floor. A material NCHW win makes a stage-1
variant a round-5 play; a wash closes the handoff item with data.

First run crashed: preferred_element_type=f32 with bf16 operands break
the conv transpose rule (f32 cotangent vs bf16 weights feed one
conv_general_dilated). Fixed by running plain bf16 convs in both arms
(the MXU accumulates in fp32 internally regardless; the comparison is
symmetric).
"""

B = 128
SHAPES = [
    ("s1 224^2 64->64", 224, 64, 64),
    ("s2 112^2 128->128", 112, 128, 128),
    ("s3 56^2 256->256", 56, 256, 256),  # control: lanes full
]


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))


for name, hw, cin, cout in SHAPES:
    flops = 2 * B * hw * hw * cin * cout * 9
    floor_ms = flops / 197e12 * 1e3
    xh = jnp.ones((B, hw, hw, cin), jnp.bfloat16)
    wh = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.01
    xc = jnp.ones((B, cin, hw, hw), jnp.bfloat16)
    wc = jnp.ones((cout, cin, 3, 3), jnp.bfloat16) * 0.01

    f_nhwc = jax.jit(conv_nhwc)
    f_nchw = jax.jit(conv_nchw)
    t1 = timeit(f_nhwc, xh, wh, k=10)
    t2 = timeit(f_nchw, xc, wc, k=10)

    def loss_h(x, w):
        return jnp.sum(conv_nhwc(x, w).astype(jnp.float32) ** 2)

    def loss_c(x, w):
        return jnp.sum(conv_nchw(x, w).astype(jnp.float32) ** 2)

    g_nhwc = jax.jit(jax.grad(loss_h, argnums=(0, 1)))
    g_nchw = jax.jit(jax.grad(loss_c, argnums=(0, 1)))
    t3 = timeit(g_nhwc, xh, wh, k=10)
    t4 = timeit(g_nchw, xc, wc, k=10)

    log(f"{name}: FLOP floor {floor_ms:.2f} ms | fwd NHWC {t1:.2f} "
        f"NCHW {t2:.2f} ({t1 / t2:.2f}x) | bwd(2 convs+fwd~3x floor "
        f"{3 * floor_ms:.2f}) NHWC {t3:.2f} NCHW {t4:.2f} "
        f"({t3 / t4:.2f}x)")

log("done: NCHW-vs-NHWC at VGG early-stage shapes, fwd and grad")
