"""Session 11: RN50 inference throughput (xla vs pallas-fused, absorb)."""
import sys, time
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench11_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.core.dtypes import BF16_POLICY
from convnet_tpu.utils.absorb_bn import search_absorb_bn

m = models.build("resnet", depth=50)
p0, s0 = m.init(jax.random.PRNGKey(0), BF16_POLICY)
pa, sa = search_absorb_bn(p0, s0)
x = jnp.ones((256,224,224,3), jnp.bfloat16)

def timed(fn, args, k=20):
    o = fn(*args); float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(k): o = fn(*args)
    float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter()-t0)/k*1e3

for tag, params, state, impl in [
        ("xla", p0, s0, "xla"),
        ("xla+absorb", pa, sa, "xla"),
        ("pallas-fused", p0, s0, "pallas"),
        ("pallas-fused+absorb", pa, sa, "pallas")]:
    fwd = jax.jit(lambda p, s, x, impl=impl: m(
        p, s, x, Context(train=False, policy=BF16_POLICY, impl=impl))[0])
    t = timed(fwd, (params, state, x))
    log(f"rn50 inference [{tag}] B=256: {t:.2f}ms = {256/t*1e3:.0f} img/s")
log("session 11 complete")
OUT.close()
