"""Job 148 (round 5, /verify): drive the shipped CLI trainer end-to-end
on the real chip — the user surface, not a harness re-implementation:
2 epochs of ResNet-20 on synthetic_structured CIFAR (train + eval +
checkpoint + results log), then reload the best checkpoint through the
self-describing Predictor and classify a batch. Asserts loss decreases,
val top-1 clears the healthy-pipeline bar, and serving agrees with the
eval path.
"""
import json
import os
import shutil
import sys

RESULTS = "/tmp/verify_r5"
shutil.rmtree(RESULTS, ignore_errors=True)

sys.argv = [
    "main.py", "--model", "resnet", "--dataset", "synthetic_structured",
    "--model-config", "{'depth': 20}", "-b", "64", "--epochs", "2",
    "--lr", "0.05", "--print-freq", "20",
    "--results-dir", RESULTS, "--save", "run1", "--seed", "7",
]
from convnet_tpu.cli.main import main
main()

res = json.load(open(os.path.join(RESULTS, "run1", "results.json")))
rows = res if isinstance(res, list) else res.get("rows", res)
first, last = rows[0], rows[-1]
log(f"epoch1 train_loss={first['train_loss']:.4f} val_top1={first['val_prec1']:.4f}")
log(f"epoch2 train_loss={last['train_loss']:.4f} val_top1={last['val_prec1']:.4f}")
assert last["train_loss"] < first["train_loss"], "loss did not decrease"
assert last["val_prec1"] > 0.90, f"val top-1 {last['val_prec1']} below healthy bar"

ckpt = os.path.join(RESULTS, "run1", "model_best.npz")
assert os.path.exists(ckpt), "model_best.npz missing"
from convnet_tpu.serve import Predictor
pred = Predictor.from_checkpoint(ckpt)
import numpy as np
from convnet_tpu.data.datasets import get_dataset
ds = get_dataset("synthetic_structured", "val", data_dir=None)
xs = np.stack([np.asarray(ds[i][0]) for i in range(32)])
ys = np.array([ds[i][1] for i in range(32)])
out = pred.predict(xs)
top1 = float((np.argmax(out, -1) == ys).mean())
log(f"Predictor.from_checkpoint top-1 on 32 val samples: {top1:.3f}")
assert top1 > 0.90, f"serving top-1 {top1}"
log("VERIFY OK: CLI train->eval->checkpoint->Predictor end-to-end on chip")
