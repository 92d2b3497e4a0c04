"""Job 103 (round 4): where do ResNeXt-50's 131 GB/step go?

Job 101's ledger: resnext{depth:50} moves 131.3 GB/step vs RN50's
82.7 GB at comparable FLOPs — the grouped-conv lowering inflates
traffic ~1.6x. Attribute per-HLO-op bytes (cost analysis is whole-step;
here we join the trace with conv signatures and ALSO dump the top
fusion bodies around grouped convs to see materialized intermediates).
Then A/B two XLA-level reformulations of the grouped 3x3:
  (a) current feature_group_count conv
  (b) groups as a vmapped/batched dot over im2col patches
  (c) groups folded into batch: reshape to (B*g, H, W, C/g) + plain conv
at the four ResNeXt block shapes, fwd + backward.
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

m = models.build("resnext", depth=50)
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
                r' window={([^}]*)}, dim_labels=([\w>_\-]+)'
                r'(?:, feature_group_count=(\d+))?'
                r'(?:, batch_group_count=(\d+))?', t):
            odt, oshape, operands, window, labels, fgc, bgc = lm.groups()
            opshapes = re.findall(r'\w+(\[[\d,]*\])', operands)
            tag = "conv"
            if fgc and int(fgc) > 1:
                tag = f"gconv(f{fgc})"
            if bgc and int(bgc) > 1:
                tag = f"gconv(b{bgc})"
            return (tag, f"{odt}{oshape} <- conv({','.join(opshapes)}) "
                    f"win[{window.strip()[:32]}] {labels}"
                    + (f" fgc={fgc}" if fgc else "")
                    + (f" bgc={bgc}" if bgc else ""))
    opm = re.search(r'= \S+ (\w+)\(', line)
    op = opm.group(1) if opm else line.split("=")[-1].strip()[:20]
    shape = re.search(r'= (\S+)', line)
    return ("other", f"{op} {shape.group(1)[:44] if shape else ''}")


p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
float(mt["loss"])
trace_dir = "/root/repo/scripts/profile_rnx_r4"
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

cat = collections.Counter()
sig_time = collections.Counter()
sig_count = collections.Counter()
total = 0.0
for inst, dur in by_inst.items():
    if inst.startswith("jit_step") or inst in ("0", "1", "2"):
        continue
    total += dur
    kind, sig = classify(inst)
    cat[kind.split("(")[0]] += dur
    sig_time[(kind, sig)] += dur
    sig_count[(kind, sig)] += 1
log(f"=== total {total/3e3:.1f} ms/step; by category ===")
for k, v in cat.most_common():
    log(f"  {v/3e3:7.2f} ms  {k}")
log("=== top 40 signatures ===")
for (kind, sig), dur in sig_time.most_common(40):
    log(f"  {dur/3e3:7.2f} ms x{sig_count[(kind, sig)]:2d} [{kind}] {sig}")

# ---- A/B the grouped 3x3 formulations at the block shapes ----
import functools

SHAPES = [  # (H, Cin=Cout, groups) for resnext-50 32x4d @ B=256
    (56, 128, 32), (28, 256, 32), (14, 512, 32), (7, 1024, 32)]
B = 256


def conv_fgc(x, w, g):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_batched(x, w, g):
    # groups -> batch: (B,H,W,C) -> (B*g, H, W, C/g), plain conv with
    # block-diag weight w (3,3,C/g,C) -> per-group (3,3,C/g,C/g)
    b, h, ww, c = x.shape
    cg = c // g
    xg = x.reshape(b, h, ww, g, cg).transpose(0, 3, 1, 2, 4).reshape(
        b * g, h, ww, cg)
    wg = w.reshape(3, 3, cg, g, cg)  # (kh,kw,cin/g, g, cout/g)
    wg = wg.transpose(3, 0, 1, 2, 4).reshape(g, 3, 3, cg, cg)

    def one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yg = jax.vmap(one, in_axes=(0, 0))(
        xg.reshape(g, b, h, ww, cg).transpose(1, 0, 2, 3, 4).reshape(
            g, b, h, ww, cg) if False else
        xg.reshape(b, g, h, ww, cg).transpose(1, 0, 2, 3, 4), wg)
    # yg (g, B, H, W, cg) -> (B,H,W,C)
    return yg.transpose(1, 2, 3, 0, 4).reshape(b, h, ww, g * cg)


for H, C, g in SHAPES:
    xx = jnp.ones((B, H, H, C), jnp.bfloat16)
    wfull = jnp.ones((3, 3, C // g, C), jnp.bfloat16) * 0.01

    def loss_fgc(x, w):
        return jnp.sum(conv_fgc(x, w, g).astype(jnp.float32))

    def loss_bat(x, w):
        return jnp.sum(conv_batched(x, w, g).astype(jnp.float32))

    for name, fn in [("fgc", loss_fgc), ("batched", loss_bat)]:
        try:
            f = jax.jit(jax.grad(fn, argnums=(0, 1)))
            dt = timeit(lambda: f(xx, wfull), k=10, warmup=2)
            cost = (jax.jit(jax.grad(fn, argnums=(0, 1)))
                    .lower(xx, wfull).compile().cost_analysis())
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            log(f"H={H} C={C} g={g} {name}: {dt:.2f} ms  "
                f"bytes={float(cost.get('bytes accessed',0))/1e9:.2f} GB "
                f"flops={float(cost.get('flops',0))/1e9:.0f} GF")
        except Exception as e:
            log(f"H={H} C={C} g={g} {name}: FAILED {str(e)[:150]}")
