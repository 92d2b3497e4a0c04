"""Job 013: dump the full HLO bodies of the top-8 most expensive
fusion instructions in the RN50 step, with per-instruction times, to
reason about their HBM traffic and fusion structure."""
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

inst_line = {}
for mo in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]*)$', hlo, re.M):
    inst_line.setdefault(mo.group(1), mo.group(2))
comp_bounds = {}
for mo in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_bounds[mo.group(1)] = mo.start()

p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
trace_dir = "/root/repo/scripts/profile_rn50_r3c"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
    float(mt["loss"])

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

top = [(i, d) for i, d in by_inst.most_common(40)
       if not i.startswith("jit_step") and i not in ("0", "1", "2")][:8]
for inst, dur in top:
    line = inst_line.get(inst, "?")
    log(f"===== {inst}  {dur/3e3:.2f} ms/step =====")
    log(f"  INSTR: {line[:500]}")
    call = re.search(r'calls=%?([\w.\-]+)', line)
    if call and call.group(1) in comp_bounds:
        st = comp_bounds[call.group(1)]
        end = hlo.find("\n}\n", st)
        body = hlo[st:end if end > 0 else st + 12000]
        # strip metadata for readability
        body = re.sub(r', metadata={[^}]*}', '', body)
        body = re.sub(r', backend_config={[^}]*}', '', body)
        for ln in body.splitlines():
            log("  " + ln[:240])
