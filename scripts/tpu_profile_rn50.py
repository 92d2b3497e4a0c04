"""Session 29b: first real op-level profile of the RN50 train step
(jax.profiler works on the axon backend — earlier 'hangs' were
device-grant waits). Parses the Chrome trace and prints the top ops by
total device time, replacing stage-slicing as the targeting tool.
"""
import sys, time, os, gzip, json, glob, collections
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_profile_rn50_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line + "\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"29b sanity {float(jnp.ones((2,2)).sum())}")
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
tr.optim.update(0, 0); hp = tr._hp_device(tr.optim.hyperparams())
step = tr._get_train_step(); r = jax.random.PRNGKey(1)
p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])
p, s, o, mt = step(p, s, o, x, y, hp, r); float(mt["loss"])

trace_dir = "/root/repo/scripts/profile_rn50"
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        p, s, o, mt = step(p, s, o, x, y, hp, r)
    float(mt["loss"])
log("trace captured")

traces = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
log(f"trace files: {traces}")
with gzip.open(traces[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find device-lane events (complete events with durations)
by_name = collections.Counter()
counts = collections.Counter()
pid_names = {e["pid"]: e["args"].get("name", "")
             for e in events if e.get("ph") == "M"
             and e.get("name") == "process_name"}
log(f"process lanes: {pid_names}")
for e in events:
    if e.get("ph") == "X" and "dur" in e:
        lane = pid_names.get(e.get("pid"), "")
        if "TPU" in lane or "Device" in lane or "/device" in lane.lower():
            name = e["name"].split(".")[0]
            by_name[name] += e["dur"]
            counts[name] += 1
if not by_name:
    # fall back: aggregate everything with a duration
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e["name"].split(".")[0]
            by_name[name] += e["dur"]
            counts[name] += 1
total = sum(by_name.values())
log(f"total traced op-time: {total/1e3/3:.1f} ms/step over 3 steps")
for name, dur in by_name.most_common(30):
    log(f"  {dur/1e3/3:8.2f} ms/step  x{counts[name]//3:<4d} {name[:90]}")
OUT.close()
