"""Job 011: split backward conv time by conv signature (shape/stride),
classifying each fused conv as wgrad (kernel-shaped output) or dgrad.
Uses the HLO saved implicitly by recompiling (compile cache warm)."""
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
comp_start = {}
for mo in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_start[mo.group(1)] = mo.start()

CONV_RE = re.compile(
    r'(\w+\[[\d,]*\])[^=]*= convolution\((.*?)\)[^\n]*?'
    r'window={([^}]*)}[^\n]*?dim_labels=([\w>_\-]+)')


def conv_sig(inst):
    line = inst_line.get(inst, "")
    call = re.search(r'calls=%?([\w.\-]+)', line)
    texts = [line]
    if call and call.group(1) in comp_start:
        st = comp_start[call.group(1)]
        texts.append(hlo[st:st + 30000])
    for t in texts:
        for lm in re.finditer(
                r'(\w+)(\[[\d,]*\])\{[^}]*\} convolution\(([^)]*)\),'
                r' window={([^}]*)}, dim_labels=([\w>_\-]+)', t):
            odt, oshape, operands, window, labels = lm.groups()
            opshapes = re.findall(r'\w+(\[[\d,]*\])', operands)
            return (f"{odt}{oshape} <- conv({','.join(opshapes)}) "
                    f"win[{window.strip()[:40]}] {labels}")
    return None


p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
trace_dir = "/root/repo/scripts/profile_rn50_r3b"
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

rows = collections.Counter()
counts = collections.Counter()
for inst, dur in by_inst.items():
    if inst.startswith("jit_step") or inst in ("0", "1", "2"):
        continue
    sig = conv_sig(inst)
    if sig:
        rows[sig] += dur
        counts[sig] += 1
log("=== conv time by signature (ms/step) ===")
for sig, dur in rows.most_common(80):
    log(f"  {dur/3e3:7.2f} ms x{counts[sig]:2d}  {sig}")
log(f"total conv: {sum(rows.values())/3e3:.1f} ms")
