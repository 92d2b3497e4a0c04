"""TPU session 6: isolate pool bwd cost."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench6_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")
def timed(fn, args, k=15):
    o = fn(*args); float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(k): o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter()-t0)/k*1e3

from convnet_tpu.ops.pallas import pool as P
B=256
build = P._build((3,3),(2,2),(1,1),(B,112,112,64),"bfloat16",False)
# access internals via a fresh _build call pieces: recreate manually
import convnet_tpu.ops.pallas.pool as pp
from convnet_tpu.ops.pool import _mp_fwd_argmax

x = jnp.ones((B,112,112,64), jnp.bfloat16)
f_fwd = jax.jit(lambda x: _mp_fwd_argmax(x,(3,3),(2,2),(1,1)))
out, idx8 = f_fwd(x)
log(f"xla argmax fwd alone: {timed(f_fwd,(x,)):.2f}ms")

idx32 = idx8.astype(jnp.int32)
dy = jnp.ones((B,56,56,64), jnp.bfloat16)

# grab the bwd path: mp's vjp — instead, time full grad of pallas op vs pieces
mp_grad = jax.jit(jax.grad(lambda h: jnp.sum(pp.max_pool2d_pallas(h,3,2,1).astype(jnp.float32))))
log(f"v4 full grad: {timed(mp_grad,(x,)):.2f}ms")

# bwd_call alone: rebuild same pieces by calling custom vjp manually
mp = pp._build((3,3),(2,2),(1,1),(B,112,112,64),"bfloat16",False)
# use jax.vjp to split fwd/bwd timing
def fwd_only(h):
    y, vjp = jax.vjp(mp, h)
    return y
log(f"vjp fwd part: {timed(jax.jit(fwd_only),(x,)):.2f}ms")
def bwd_given(h, dy):
    y, vjp = jax.vjp(mp, h)
    return vjp(dy)[0]
log(f"vjp fwd+bwd: {timed(jax.jit(bwd_given),(x, dy)):.2f}ms")
log("session 6 complete")
OUT.close()
