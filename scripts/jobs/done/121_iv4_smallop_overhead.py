"""Job 121 (round 4): identify Inception-v4's 15.5 ms of tiny ops.

Job 120: 150.3 ms step = 129.5 ms convs + 15.5 ms across 1,625 device
events whose trace names didn't resolve to HLO conv/fusion lines
(name bucket '{"flag_configs":...'). Hypotheses:
  (H1) per-leaf optimizer/BN-update fusions — Inception-v4 has ~600
       param/stat leaves, each a separate tiny fusion with fixed
       dispatch cost;
  (H2) trace metadata events double-counting real kernels;
  (H3) concat/copy ops from the branchy graph.
This job: (a) dumps exemplar event names + durations from that bucket,
(b) counts HLO fusion instructions by output size in the compiled step,
(c) A/Bs a flat-params SGD microbench: N=600 small tensors updated
per-leaf vs one concatenated buffer, to bound the per-op dispatch cost.
"""
import collections
import glob
import gzip
import json
import re

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

m = models.build("inception_v4")
tr = Trainer(m, OptimRegime(m.regime), 1000,
             TrainerConfig(dtype="bf16", print_freq=0))
p, s = m.init(jax.random.PRNGKey(0), tr.policy)
p, s, o = tr.initialize(p, s)
leaves = jax.tree_util.tree_leaves(p)
log(f"param leaves: {len(leaves)}; state leaves: "
    f"{len(jax.tree_util.tree_leaves(s))}; opt leaves: "
    f"{len(jax.tree_util.tree_leaves(o))}")
B = 128
x = jnp.ones((B, 299, 299, 3), jnp.bfloat16)
y = jnp.zeros((B,), jnp.int32)
tr.optim.update(0, 0)
hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step()
r = jax.random.PRNGKey(1)

compiled = step.lower(p, s, o, x, y, hp, r).compile()
hlo = compiled.as_text()
inst_names = set(re.findall(r'^\s*(?:ROOT )?%?([\w.\-]+) = ', hlo, re.M))

p2, s2, o2, mt = step(p, s, o, x, y, hp, r)
fetch1(mt["loss"])
trace_dir = "/root/repo/scripts/profile_iv4b_r4"
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

bucket = collections.Counter()
bucket_n = collections.Counter()
examples = {}
for e in dev:
    nm = e["name"]
    if nm.startswith("jit_step") or nm in ("0", "1", "2"):
        continue
    if nm in inst_names:
        key = "hlo:" + re.sub(r'[.\d]+$', '', nm)
    else:
        key = "???:" + nm[:30]
    bucket[key] += e["dur"]
    bucket_n[key] += 1
    if key not in examples:
        examples[key] = (nm[:120], e.get("args", {}))
log("=== device time by op-name family (ms/step) ===")
for k, v in bucket.most_common(25):
    log(f"  {v/3e3:7.2f} ms x{bucket_n[k]/3:6.0f}  {k}")
for k in list(bucket)[:0]:
    pass
log("=== exemplars for non-HLO buckets ===")
shown = 0
for k, (nm, args) in examples.items():
    if k.startswith("???") and shown < 8:
        log(f"  {k} -> name={nm!r} args-keys={list(args)[:6]}")
        shown += 1

# how many tiny fusions does the step graph carry?
sizes = collections.Counter()
for mo in re.finditer(r'^\s*(?:ROOT )?%?[\w.\-]+ = \S*?'
                      r'(f32|bf16)\[([\d,]*)\][^=]*fusion\(', hlo, re.M):
    dims = [int(d) for d in mo.group(2).split(",") if d]
    n = 1
    for d in dims:
        n *= d
    sizes["<=4K elems" if n <= 4096 else
          ("<=1M" if n <= 1 << 20 else ">1M")] += 1
log(f"fusion instruction count by output size: {dict(sizes)}")

# (c) per-leaf vs flat SGD microbench at Inception-v4's leaf census
shapes = [tuple(l.shape) for l in leaves]
ps = [jnp.ones(sh, jnp.float32) for sh in shapes]
gs = [jnp.ones(sh, jnp.float32) * 1e-3 for sh in shapes]
vs = [jnp.zeros(sh, jnp.float32) for sh in shapes]


@jax.jit
def per_leaf(ps, gs, vs):
    nv = [0.9 * v + g for v, g in zip(vs, gs)]
    np_ = [p - 0.1 * v for p, v in zip(ps, nv)]
    return np_, nv


flatp = jnp.concatenate([x_.ravel() for x_ in ps])
flatg = jnp.concatenate([x_.ravel() for x_ in gs])
flatv = jnp.concatenate([x_.ravel() for x_ in vs])


@jax.jit
def flat(p, g, v):
    nv = 0.9 * v + g
    return p - 0.1 * nv, nv


t1 = timeit(lambda: per_leaf(ps, gs, vs), k=20, warmup=3)
t2 = timeit(lambda: flat(flatp, flatg, flatv), k=20, warmup=3)
log(f"SGD momentum update, {len(shapes)} leaves "
    f"({sum(int(np.prod(s_)) for s_ in shapes)/1e6:.1f}M params): "
    f"per-leaf {t1:.3f} ms vs flat {t2:.3f} ms ({t1/t2:.1f}x)")
