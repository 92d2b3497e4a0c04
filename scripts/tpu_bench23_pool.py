"""Session 23: cost decomposition of the erratum-safe max-pool path.

Times, at the RN50 stem shape and GoogLeNet's stride-2 pool shapes
(bf16, B=256): reduce_window fwd alone, argmax-chain fwd alone, the
safe VJP-forward (reduce_window + idx-from-out), and full fwd+bwd for
both formulations — to locate the GoogLeNet 97.6 -> 122.9 ms step
regression and decide whether the safe path's extra cost is the
reduce_window or the unfused idx recovery. Harness: k dispatches per
window, closed by a 1-element fetch (session-15 discipline).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from convnet_tpu.ops import pool as pm


def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def timeit(fn, *args, k=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fetch1(out)
    return (time.perf_counter() - t0) / k * 1e3


print(f"sanity {float(jnp.ones((2, 2)).sum())}", flush=True)
K, S, P = (3, 3), (2, 2), (1, 1)

for shape in [(256, 112, 112, 64), (256, 56, 56, 192), (256, 28, 28, 480)]:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                    dtype=jnp.bfloat16)

    rw = jax.jit(lambda x_: pm._mp_fwd_reduce_window(x_, K, S, P))
    am = jax.jit(lambda x_: pm._mp_fwd_argmax(x_, K, S, P)[0])
    am2 = jax.jit(lambda x_: pm._mp_fwd_argmax(x_, K, S, P))
    safe_fwd = jax.jit(lambda x_: (
        lambda o: (o, pm._mp_idx_from_out(x_, o, K, S, P)))(
            pm._mp_fwd_reduce_window(x_, K, S, P)))
    mp = pm._make_max_pool(K, S, P, x.shape, str(x.dtype))
    g_safe = jax.jit(jax.grad(
        lambda x_: jnp.sum(mp(x_).astype(jnp.float32))))

    # unsafe fwd+bwd for comparison: same custom_vjp with argmax fwd
    @jax.custom_vjp
    def mp_unsafe(x_):
        return pm._mp_fwd_argmax(x_, K, S, P)[0]

    def _fwd(x_):
        return pm._mp_fwd_argmax(x_, K, S, P)

    def _bwd(idx, dy):
        return (pm._mp_bwd(K, S, P, shape, str(x.dtype), idx, dy),)

    mp_unsafe.defvjp(_fwd, _bwd)
    g_unsafe = jax.jit(jax.grad(
        lambda x_: jnp.sum(mp_unsafe(x_).astype(jnp.float32))))

    print(f"shape {shape}:", flush=True)
    print(f"  reduce_window fwd        {timeit(rw, x):7.2f} ms", flush=True)
    print(f"  argmax-chain fwd         {timeit(am, x):7.2f} ms", flush=True)
    print(f"  argmax-chain fwd+idx     {timeit(am2, x):7.2f} ms", flush=True)
    print(f"  safe fwd+idx             {timeit(safe_fwd, x):7.2f} ms", flush=True)
    print(f"  fwd+bwd safe (current)   {timeit(g_safe, x):7.2f} ms", flush=True)
    print(f"  fwd+bwd argmax (round2a) {timeit(g_unsafe, x):7.2f} ms", flush=True)
