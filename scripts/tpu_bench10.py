"""Session 10: end-to-end epoch on TPU (CLI path, data pipeline incl.)
+ serving throughput."""
import sys, time, json
sys.path.insert(0, "/root/repo")
OUT = open("/root/repo/scripts/tpu_bench10_results.txt", "a")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True); OUT.write(line+"\n"); OUT.flush()
import jax, jax.numpy as jnp, numpy as np
log(f"sanity {float(jnp.ones((2,2)).sum())}")

# --- end-to-end CLI training run on TPU (synthetic imagenet-sized) ---
from convnet_tpu.cli.main import main
t0 = time.perf_counter()
res = main([
    "--dataset", "synthetic_imagenet", "--model", "resnet",
    "--model-config", "{'depth': 50}",
    "-b", "256", "--epochs", "2", "--dtype", "bf16",
    "--print-freq", "0", "--save", "tpu-e2e", "--results-dir", "/tmp/tpu-e2e",
])
wall = time.perf_counter() - t0
rows = json.load(open("/tmp/tpu-e2e/tpu-e2e/results.json"))
for r in rows:
    log(f"e2e epoch {r['epoch']}: step_p50 {1e3*r['step_time_p50']:.1f}ms "
        f"data_time {1e3*r['data_time']:.1f}ms "
        f"→ {256/ r['step_time_p50']:.0f} img/s sustained")
log(f"e2e wall (2 epochs, 2048 imgs, incl. compile+eval): {wall:.0f}s")

# --- serving throughput (Predictor, absorb-bn, bf16) -----------------
from convnet_tpu.serve import Predictor
for absorb in (False, True):
    p = Predictor("resnet", {"depth": 50}, dtype="bf16", batch_size=256,
                  absorb_bn=absorb, impl="xla")
    x = np.ones((256, 224, 224, 3), np.float32)
    p.predict_logits(x)  # compile
    t0 = time.perf_counter()
    k = 8
    for _ in range(k):
        out = p.predict_logits(x)
    dt = (time.perf_counter() - t0) / k
    log(f"serving rn50 bf16 absorb={absorb}: {dt*1e3:.1f}ms/256 = "
        f"{256/dt:.0f} img/s (incl. host transfer both ways)")
log("session 10 complete")
OUT.close()
