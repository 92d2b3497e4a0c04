"""Session 29d: GoogLeNet profile + HLO join. Captures the train-step trace
AND the optimized HLO text in one process, then prints the top device
ops with their HLO definitions — the first real op-level attribution
on this backend.
"""
import sys, time, os, gzip, json, glob, collections, re
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_profile_gln_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"29c sanity {float(jnp.ones((2,2)).sum())}")
from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("googlenet")
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)
y = jnp.zeros((256,), jnp.int32)
tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step(); r = jax.random.PRNGKey(1)

compiled = step.lower(p, s, o, x, y, hp, r).compile()
hlo = compiled.as_text()
with open("/root/repo/scripts/profile_gln/step_hlo.txt", "w") as f:
    f.write(hlo)
log(f"HLO text: {len(hlo)/1e6:.1f} MB")

# index fusion definitions: name -> first line of the fused computation
defs = {}
for mobj in re.finditer(r'^\s*%?([\w.\-]+) = [^\n]*fusion\([^\n]*calls=%?([\w.\-]+)', hlo, re.M):
    defs[mobj.group(1)] = mobj.group(2)
comp_bodies = {}
for mobj in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_bodies[mobj.group(1)] = mobj.start()

def describe(op_name):
    comp = defs.get(op_name)
    if comp is None:
        return ""
    start = comp_bodies.get(comp)
    if start is None:
        return comp
    body = hlo[start:start + 4000]
    kinds = collections.Counter(re.findall(r'= *[\w\[\]<>,{} ]+? (\w[\w\-]*)\(', body))
    shapes = re.findall(r'-> ([^{]+)\{', body[:200])
    top = ",".join(f"{k}x{v}" for k, v in kinds.most_common(5))
    return f"{comp} -> {shapes[0].strip() if shapes else ''} [{top}]"

p2, s2, o2, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
trace_dir = "/root/repo/scripts/profile_gln"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
    float(mt["loss"])
log("trace captured")

traces = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
with gzip.open(traces[-1], "rt") as f:
    trace = json.load(f)
ev = trace["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = [e for e in ev if e.get("ph") == "X" and "dur" in e
       and pid_names.get(e.get("pid"), "") == "/device:TPU:0"]
by = collections.Counter()
for e in dev:
    by[e["name"]] += e["dur"]
log("top 40 device ops (ms/step over 3 steps):")
for name, dur in by.most_common(44):
    if name.startswith("jit_step") or name in ("0", "1", "2"):
        continue
    log(f"  {dur/3e3:7.2f} ms  {name[:40]:40s} {describe(name)[:120]}")

# category rollup
cat = collections.Counter()
for name, dur in by.items():
    if name.startswith("jit_step") or name in ("0", "1", "2"):
        continue
    cat[re.sub(r"\.\d+$", "", name)] += dur
log("rollup by fusion kind:")
for name, dur in cat.most_common(15):
    log(f"  {dur/3e3:7.2f} ms  {name}")
OUT.close()
