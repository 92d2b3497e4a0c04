"""Job 123 (round 4): VGG-16 — the zoo's one compute-leaning outlier.

Ledger row (job 101): 110.2 ms/step at B=128@224, 11,561 GF + 54.0 GB.
Floors: FLOP 58.7 ms, HBM 65.9 ms — the step runs 44 ms (67%) above
its FLOP floor and 67% above its bytes floor, by far the furthest of
any zoo member from BOTH floors (53.2% MFU / 59.8% HBM-SoL), and the
only one where neither floor explains the time. Attribute per-op time
by category like jobs 013/100/120: VGG's plain 3x3 conv stack should
be the friendliest possible MXU workload, so whatever runs below 60%
of its own floor here is a real emitter finding.
"""

import collections
import glob
import gzip
import json
import re

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("vgg", depth=16)
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
B = 128
x = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
y = jnp.zeros((B,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)

compiled = step.lower(p, s, o, x, y, hp, r).compile()
cost = compiled.cost_analysis()
if isinstance(cost, (list, tuple)):
    cost = cost[0]
gf = float(cost.get("flops", 0)) / 1e9
gb = float(cost.get("bytes accessed", 0)) / 1e9
log(f"cost: {gf:.0f} GF, {gb:.2f} GB -> FLOP floor {gf/197e3*1e3:.1f} ms,"
    f" HBM floor {gb/819:.1f} ms")
hlo = compiled.as_text()

inst_line = {}
for mo in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]*)$', hlo, re.M):
    inst_line.setdefault(mo.group(1), mo.group(2))
comp_start = {}
for mo in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_start[mo.group(1)] = mo.start()


def classify(inst):
    line = inst_line.get(inst, "")
    texts = [line]
    call = re.search(r'calls=%?([\w.\-]+)', line)
    if call and call.group(1) in comp_start:
        st = comp_start[call.group(1)]
        texts.append(hlo[st:st + 40000])
    for t in texts:
        for lm in re.finditer(
                r'(\w+)(\[[\d,]*\])\{[^}]*\} convolution\(([^)]*)\),'
                r' window={([^}]*)}, dim_labels=([\w>_\-]+)', t):
            odt, oshape, operands, window, labels = lm.groups()
            opshapes = re.findall(r'\w+(\[[\d,]*\])', operands)
            return ("conv", f"{odt}{oshape} <- conv({','.join(opshapes)}) "
                    f"win[{window.strip()[:28]}] {labels}")
    for t in texts:
        if "reduce-window" in t:
            return ("pool", line.split("=")[1].strip()[:60])
    opm = re.search(r'= \S+ (\w+)\(', line)
    op = opm.group(1) if opm else line.split("=")[-1].strip()[:20]
    shape = re.search(r'= (\S+)', line)
    return ("other:" + op, f"{op} {shape.group(1)[:44] if shape else ''}")


p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
fetch1(mt["loss"])
trace_dir = "/root/repo/scripts/profile_vgg_r4"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
    fetch1(mt["loss"])

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

cat = collections.Counter()
sig_time = collections.Counter()
sig_count = collections.Counter()
total = 0.0
for inst, dur in by_inst.items():
    if inst.startswith("jit_step") or inst in ("0", "1", "2"):
        continue
    total += dur
    kind, sig = classify(inst)
    cat[kind] += dur
    sig_time[(kind, sig)] += dur
    sig_count[(kind, sig)] += 1
log(f"=== total {total/3e3:.1f} ms/step; by category ===")
for k, v in cat.most_common(15):
    log(f"  {v/3e3:7.2f} ms  {k}")
log("=== top 40 signatures ===")
for (kind, sig), dur in sig_time.most_common(40):
    log(f"  {dur/3e3:7.2f} ms x{sig_count[(kind, sig)]:2d} [{kind}] {sig}")
