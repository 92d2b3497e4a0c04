"""Job 010: per-conv wgrad attribution for RN50 B=256@224 bf16.

Joins the profiler trace with optimized-HLO metadata (op_name/source)
to build a table: for each conv in the model, how much step time its
weight-grad fusion(s) cost. This tells the Pallas wgrad kernel which
shapes to target first.
"""
import collections
import glob
import gzip
import json
import re

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("resnet", depth=50)
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
x = jnp.ones((256, 224, 224, 3), jnp.bfloat16)
y = jnp.zeros((256,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)

compiled = step.lower(p, s, o, x, y, hp, r).compile()
hlo = compiled.as_text()
log(f"HLO {len(hlo)/1e6:.1f} MB")

# Map each top-level instruction name -> its full line (with metadata).
inst_line = {}
for mo in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]*)$', hlo, re.M):
    inst_line.setdefault(mo.group(1), mo.group(2))

# Map fusion computation name -> body text (to dig for conv metadata).
comp_start = {}
for mo in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_start[mo.group(1)] = mo.start()


def opname_of(inst):
    """Extract metadata op_name for an instruction; if it's a fusion,
    prefer a convolution op inside the called computation."""
    line = inst_line.get(inst, "")
    call = re.search(r'calls=%?([\w.\-]+)', line)
    texts = [line]
    if call and call.group(1) in comp_start:
        st = comp_start[call.group(1)]
        texts.append(hlo[st:st + 20000])
    # look for a convolution's op_name first
    for t in texts:
        for lm in re.finditer(r'convolution\([^\n]*op_name="([^"]+)"', t):
            return "CONV " + lm.group(1)
    for t in texts:
        lm = re.search(r'op_name="([^"]+)"', t)
        if lm:
            return lm.group(1)
    return "?"


p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
trace_dir = "/root/repo/scripts/profile_rn50_r3"
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
by_inst = collections.Counter()
for e in dev:
    by_inst[e["name"]] += e["dur"]

# Aggregate per metadata op_name.
by_op = collections.Counter()
for inst, dur in by_inst.items():
    if inst.startswith("jit_step") or inst in ("0", "1", "2"):
        continue
    by_op[opname_of(inst)] += dur

log("=== per-op_name time (ms/step), top 60 ===")
for name, dur in by_op.most_common(60):
    log(f"  {dur/3e3:7.2f} ms  {name[:150]}")

# Conv rollup: classify forward vs dgrad vs wgrad via op_name path.
conv_rows = collections.Counter()
for name, dur in by_op.items():
    if not name.startswith("CONV "):
        continue
    conv_rows[name] += dur
log("=== conv ops only ===")
for name, dur in conv_rows.most_common(80):
    log(f"  {dur/3e3:7.2f} ms  {name[:160]}")
