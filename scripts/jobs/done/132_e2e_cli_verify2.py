"""Job 132 (round 4, session 5): e2e CLI verify, README-exact recipe.

Job 131 proved train->checkpoint->resume->results plumbing but used
24 total steps (b128 x 3 epochs on the 1024-sample set) -- too few to
learn. This rerun uses the README Quick-start recipe (b64, lr 0.05,
5 epochs = 80 steps), which doubles as validation that the README
example works as documented.

Session hygiene: the unit suite is green (226 fast + slow running on
CPU), but drive the REAL user surface once on the real TPU — train →
checkpoint → resume → evaluate → serve — to catch integration
regressions unit tests miss. RN20/synthetic_structured (learnable prototypes, no data on disk), 2 epochs + 1 resumed epoch, then a Predictor forward from the
saved best checkpoint.
"""

import glob
import json
import os
import shutil

RES = "/tmp/vr132"
shutil.rmtree(RES, ignore_errors=True)

from convnet_tpu.cli.main import main

base = ["--model", "resnet", "--dataset", "synthetic_structured",
        "--model-config", "{'depth': 20}", "-b", "64",
        "--dtype", "bf16", "--print-freq", "20", "--lr", "0.05",
        "--results-dir", RES, "--save", "run1", "--seed", "7"]

log("=== phase 1: train 2 epochs ===")
main(base + ["--epochs", "4"])
ckpts = sorted(glob.glob(os.path.join(RES, "run1", "*.npz")))
log(f"checkpoints: {[os.path.basename(c) for c in ckpts]}")
assert any("checkpoint" in c for c in ckpts), "no checkpoint written"

results_json = os.path.join(RES, "run1", "results.json")
rows = []
if os.path.exists(results_json):
    rows = json.load(open(results_json))
    log(f"results rows: {len(rows)}; last: "
        f"{ {k: rows[-1][k] for k in ('epoch', 'train_prec1', 'val_prec1')
             if k in rows[-1]} }")

log("=== phase 2: resume to epoch 3 ===")
main(base + ["--epochs", "5",
             "--resume", os.path.join(RES, "run1", "checkpoint.npz")])
rows2 = json.load(open(results_json))
log(f"after resume: {len(rows2)} rows; epochs "
    f"{[r.get('epoch') for r in rows2]}")
assert len(rows2) >= 5, "resume did not append epoch rows"
v1 = rows2[-1].get("val_prec1", 0.0)
log(f"final val_prec1 {v1:.2f} (chance=10.0)")
assert v1 > 50.0, f"val accuracy {v1} not above-chance after 3 epochs"

log("=== phase 3: serve from model_best ===")
from convnet_tpu.serve import Predictor
best = os.path.join(RES, "run1", "model_best.npz")
pred = Predictor("resnet", model_config={"depth": 20}, checkpoint=best,
                 dtype="bf16", batch_size=4, input_size=32)
xs = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype("uint8")
out = pred(xs)
probs = np.asarray(out)
log(f"predictor logits shape {probs.shape}; "
    f"argmax {probs.argmax(-1).tolist()}")
assert probs.shape == (4, 10)

log("done: e2e CLI train->resume->serve on chip OK")
