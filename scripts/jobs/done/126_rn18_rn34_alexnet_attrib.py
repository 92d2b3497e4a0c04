"""Job 126 (round 4): attribute the last un-attributed ledger rows.

AlexNet-BN (81.9% HBM-SoL), ResNet-18 (81.2%), ResNet-34 (78.5%) are
the only zoo rows that never received the job-013/100/120/123
per-op treatment. Absolute headroom over the bytes floor: RN34
11.9 ms, RN18 6.9 ms, AlexNet 2.7 ms per step. Question: is the
above-floor time concentrated (a lever) or spread across convs
running at VGG-like emitter efficiency (a closure)? RN34 is the
interesting one — its basic blocks are plain 3×3 convs at 56²–28²
with C=64–128, exactly the shape class job 123/124 showed the
emitter handles at ~35–55% of floor.
"""

import collections
import glob
import gzip
import json
import re

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

MODELS = [
    ("alexnet", {}, 256),
    ("resnet", {"depth": 18}, 256),
    ("resnet", {"depth": 34}, 256),
]


def classify_factory(hlo):
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
            if "reduce-window" in t or "select-and-scatter" in t:
                return ("pool", line.split("=")[1].strip()[:60])
        opm = re.search(r'= \S+ (\w+)\(', line)
        op = opm.group(1) if opm else line.split("=")[-1].strip()[:20]
        shape = re.search(r'= (\S+)', line)
        return ("other:" + op, f"{op} {shape.group(1)[:44] if shape else ''}")

    return classify


for name, kw, B in MODELS:
    m = models.build(name, **kw)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
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
    tag = f"{name}{kw.get('depth', '')}"
    log(f"--- {tag}: {gf:.0f} GF, {gb:.2f} GB -> FLOP floor "
        f"{gf/197e3*1e3:.1f} ms, HBM floor {gb/819:.1f} ms")
    classify = classify_factory(compiled.as_text())

    p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
    fetch1(mt["loss"])
    trace_dir = f"/root/repo/scripts/profile_{tag}_r4"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            p2, s2, o2, mt = step(p2, s2, o2, x, y, hp, r)
        fetch1(mt["loss"])

    traces = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))
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
    log(f"=== {tag} total {total/3e3:.1f} ms/step; by category ===")
    for k, v in cat.most_common(10):
        log(f"  {v/3e3:7.2f} ms  {k}")
    log(f"=== {tag} top 20 signatures ===")
    for (kind, sig), dur in sig_time.most_common(20):
        log(f"  {dur/3e3:7.2f} ms x{sig_count[(kind, sig)]:2d} [{kind}] {sig}")

log("done: AlexNet/RN18/RN34 attribution")
