"""Job 130 (round 4): re-run the job-115 Mosaic HTTP-500 bisect.

The lane-split reshape crash is a remote-compiler (Mosaic service)
limitation; if the service has been updated since job 115, these
cases compiling would unlock the fused-MBConv training path and the
folded-layout kernels. Identical probe cases to job 115.
"""
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CH = 256, 112, 112, 32, 96
WP = W + 4
WPC = WP * C
WPCH = WP * CH
HP = 120

x4 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
xf = jnp.pad(x4, ((0, 0), (1, 7), (1, 3), (0, 0))).reshape(B, HP, WPC)
xe = xf[:, :H, :]  # equal-rows variant (112 rows)
we = jax.random.normal(jax.random.PRNGKey(1), (C, CH), jnp.bfloat16) * 0.2


def run(name, call, *args):
    try:
        f = jax.jit(lambda *a: call(*a))
        f(*args)
        t = timeit(f, *args, k=20)
        log(f"{name}: {t:.3f} ms")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:130]}")


def mk(body, in_rows, out_rows, lanes_out, extra_specs=()):
    return pl.pallas_call(
        body, grid=(B,),
        in_specs=[pl.BlockSpec((1, in_rows, WPC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] + list(extra_specs),
        out_specs=pl.BlockSpec((1, out_rows, lanes_out),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, lanes_out),
                                       jnp.bfloat16))


# (a) row-mismatch copy: in 120 rows, out 112
def k_a(x_ref, o_ref):
    o_ref[0] = x_ref[0][0:112, :] * 2.0


run("a rowMismatchCopy in120/out112", mk(k_a, HP, H, WPC), xf)


# (b) equal rows + sliced add (like rowshift but from 112-row input)
def k_b(x_ref, o_ref):
    v = x_ref[0]
    o_ref[0] = v * 2.0


run("b equalRowsCopy 120/120", mk(k_b, HP, HP, WPC), xf)


# (c) laneSplit dot with EQUAL rows (112 in, 112 out)
def k_c(x_ref, w_ref, o_ref):
    v = x_ref[0].reshape(H, WP, C)
    h = jax.lax.dot_general(v, w_ref[:], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = h.astype(jnp.bfloat16).reshape(H, WPCH)


run("c laneSplit equal 112/112", mk(
    k_c, H, H, WPCH,
    extra_specs=[pl.BlockSpec((C, CH), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)]), xe, we)


# (d) pixMajor dot with equal rows
def k_d(x_ref, w_ref, o_ref):
    v = x_ref[0].reshape(H * WP, C)
    h = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = h.astype(jnp.bfloat16).reshape(H, WPCH)


run("d pixMajor equal 112/112", mk(
    k_d, H, H, WPCH,
    extra_specs=[pl.BlockSpec((C, CH), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)]), xe, we)


# (e) weights-multiply with equal rows (9, WPC) block
wd9 = jax.random.normal(jax.random.PRNGKey(2), (9, C), jnp.float32) * 0.2
wrows = jnp.tile(wd9.reshape(9, 1, C), (1, WP, 1)).reshape(9, WPC)


def k_e(x_ref, w_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    acc = v * w_ref[0:1, :]
    for k in (1, 2):
        acc = acc + v * w_ref[k:k + 1, :]
    o_ref[0] = acc.astype(jnp.bfloat16)


run("e weightsMul equal 112/112", mk(
    k_e, H, H, WPC,
    extra_specs=[pl.BlockSpec((9, WPC), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)]), xe, wrows)
