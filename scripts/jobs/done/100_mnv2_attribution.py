"""Job 100 (round 4): MobileNet-V2 train-step attribution.

VERDICT r3 #1: MNv2 trains at 5.1% MFU (5,577 img/s B=256@224) with no
speed-of-light analysis. Apply the job-011/013 methodology: whole-step
XLA cost analysis (flops + bytes accessed -> FLOP-SoL and BW-SoL), then
trace+HLO join to attribute device time per instruction, classifying
depthwise vs pointwise convs vs other.
"""
import collections
import glob
import gzip
import json
import re
import time

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

HBM_GBPS = 819.0  # v5e HBM bandwidth
PEAK_TFLOPS = 197.0  # v5e bf16

m = models.build("mobilenet_v2")
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
B, IMG = 256, 224
x = jnp.ones((B, IMG, IMG, 3), jnp.bfloat16)
y = jnp.zeros((B,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)

compiled = step.lower(p, s, o, x, y, hp, r).compile()
cost = compiled.cost_analysis()
if isinstance(cost, (list, tuple)):
    cost = cost[0]
flops = float(cost.get("flops", 0.0))
bytes_acc = float(cost.get("bytes accessed", 0.0))
log(f"cost_analysis keys w/ 'bytes': "
    f"{ {k: v for k, v in cost.items() if 'bytes' in k and '{' not in k} }")
log(f"step flops={flops/1e9:.1f} GF  bytes={bytes_acc/1e9:.2f} GB")

# timing
p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
for _ in range(2):
    p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
float(mt["loss"])
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(12):
        p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
    float(mt["loss"])
    dt = (time.perf_counter() - t0) / 12 * 1e3
    best = dt if best is None else min(best, dt)
p50 = best
log(f"MNv2 B={B}@{IMG}: {p50:.2f} ms = {B/p50*1e3:.0f} img/s")
log(f"  FLOP-SoL: {flops/1e12/(p50/1e3):.1f} TF/s = "
    f"{flops/1e12/(p50/1e3)/PEAK_TFLOPS*100:.1f}% MFU")
log(f"  BW-SoL:   {bytes_acc/1e9/(p50/1e3):.0f} GB/s = "
    f"{bytes_acc/1e9/(p50/1e3)/HBM_GBPS*100:.1f}% of HBM "
    f"(bytes floor {bytes_acc/1e9/HBM_GBPS*1e3:.1f} ms)")

# --- trace + HLO join ---
hlo = compiled.as_text()
inst_line = {}
for mo in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]*)$', hlo, re.M):
    inst_line.setdefault(mo.group(1), mo.group(2))
comp_start = {}
for mo in re.finditer(r'^%?([\w.\-]+) \([^)]*\) -> [^{]+\{', hlo, re.M):
    comp_start[mo.group(1)] = mo.start()


def inst_text(inst):
    """HLO line of inst plus (if a fusion) its called computation body."""
    line = inst_line.get(inst, "")
    texts = [line]
    call = re.search(r'calls=%?([\w.\-]+)', line)
    if call and call.group(1) in comp_start:
        st = comp_start[call.group(1)]
        texts.append(hlo[st:st + 40000])
    return texts


def classify(inst):
    texts = inst_text(inst)
    for t in texts:
        for lm in re.finditer(
                r'(\w+)(\[[\d,]*\])\{[^}]*\} convolution\(([^)]*)\),'
                r' window={([^}]*)}, dim_labels=([\w>_\-]+)'
                r'(?:, feature_group_count=(\d+))?', t):
            odt, oshape, operands, window, labels, fgc = lm.groups()
            opshapes = re.findall(r'\w+(\[[\d,]*\])', operands)
            kind = "conv"
            if fgc and int(fgc) > 1:
                kind = f"dwconv(g={fgc})"
            return (kind, f"{odt}{oshape} <- conv({','.join(opshapes)}) "
                    f"win[{window.strip()[:32]}] {labels}"
                    + (f" fgc={fgc}" if fgc else ""))
    line = texts[0]
    opm = re.search(r'= \S+ (\w+)\(', line)
    op = opm.group(1) if opm else line.split("=")[-1].strip()[:20]
    shape = re.search(r'= (\S+)', line)
    return ("other", f"{op} {shape.group(1)[:40] if shape else ''}")


trace_dir = "/root/repo/scripts/profile_mnv2_r4"
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

cat_time = collections.Counter()
sig_time = collections.Counter()
sig_count = collections.Counter()
total = 0.0
for inst, dur in by_inst.items():
    if inst.startswith("jit_step") or inst in ("0", "1", "2"):
        continue
    total += dur
    kind, sig = classify(inst)
    cat_time[kind.split("(")[0]] += dur
    sig_time[(kind, sig)] += dur
    sig_count[(kind, sig)] += 1

log(f"=== total device time {total/3e3:.1f} ms/step; by category ===")
for k, v in cat_time.most_common():
    log(f"  {v/3e3:7.2f} ms  {k}")
log("=== top 45 signatures (ms/step) ===")
for (kind, sig), dur in sig_time.most_common(45):
    log(f"  {dur/3e3:7.2f} ms x{sig_count[(kind, sig)]:2d} [{kind:12s}] {sig}")
