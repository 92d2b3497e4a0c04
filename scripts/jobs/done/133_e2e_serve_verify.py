"""Job 133 (round 4, session 6): finish the e2e CLI verify — serve phase.

Job 132 trained RN20 to 99.7% held-out via the README recipe and
verified resume, but its serve phase crashed: it built the Predictor
with model_config={'depth': 20} and no dataset, so the ImageNet
factory rejected depth 20. That failure motivated a framework fix —
checkpoints already record model name + config (cli/main.py), so
`Predictor.from_checkpoint(path)` now rebuilds the trained
architecture with zero arguments (serve.py). This job drives the NEW
surface on the real chip against job 132's surviving run directory
(retrains 2 epochs if /tmp/vr132 was cleaned).
"""

import glob
import json
import os

RES = "/tmp/vr132"
best = os.path.join(RES, "run1", "model_best.npz")
if not os.path.exists(best):
    log("no surviving run dir; retraining 2 epochs")
    from convnet_tpu.cli.main import main
    main(["--model", "resnet", "--dataset", "synthetic_structured",
          "--model-config", "{'depth': 20}", "-b", "64",
          "--dtype", "bf16", "--print-freq", "20", "--lr", "0.05",
          "--results-dir", RES, "--save", "run1", "--seed", "7",
          "--epochs", "2"])
assert os.path.exists(best), "model_best.npz missing"

log("=== serve via Predictor.from_checkpoint (self-describing) ===")
from convnet_tpu.serve import Predictor
pred = Predictor.from_checkpoint(best, dtype="bf16", batch_size=64)
log(f"rebuilt model: {type(pred.model).__name__}, "
    f"input_size={pred.input_size}")
assert pred.input_size == 32, pred.input_size

# serve the actual eval split the run validated on: synthetic_structured
# is seeded, so accuracy through the Predictor should match the run's
# final val_prec1 (~99.7) — an end-to-end checkpoint+normalization check
from convnet_tpu.data.datasets import get_dataset
ds = get_dataset("synthetic_structured", split="val")
xs, ys = [], []
for i in range(256):
    x, y = ds[i]
    xs.append(np.asarray(x)); ys.append(y)
xs = np.stack(xs); ys = np.asarray(ys)
log(f"eval batch {xs.shape} dtype={xs.dtype} range "
    f"[{xs.min():.3f},{xs.max():.3f}]")
# dataset yields normalized float arrays already? Predictor normalizes
# [0,1]/uint8 inputs itself — detect and route accordingly
if xs.dtype == np.uint8 or (xs.min() >= 0.0 and xs.max() <= 1.0):
    cls = pred.predict(xs)
else:
    # already-normalized floats: bypass double normalization
    pred2 = Predictor.from_checkpoint(best, dtype="bf16",
                                      batch_size=64, normalize=None)
    cls = pred2.predict(xs)
acc = float((cls == ys).mean()) * 100
log(f"Predictor accuracy on val[0:256]: {acc:.2f}% (run reported 99.71)")
assert acc > 90.0, f"served accuracy {acc} far below the run's val_prec1"

log("=== exported-artifact path from the same checkpoint ===")
art = pred.export()
from convnet_tpu.serve import load_exported
ep = load_exported(art)
x_u8 = (np.clip(xs, 0, 1) * 255).astype(np.uint8) \
    if xs.dtype != np.uint8 else xs
out = ep.predict(x_u8[:64])
agree = float((out == pred.predict(x_u8[:64])).mean()) * 100
log(f"exported vs live predictor agreement on 64: {agree:.1f}%")
assert agree == 100.0

log("done: self-describing serve + export verified on chip")
