#!/usr/bin/env bash
# Deployment journey: train -> export -> serve over HTTP.
# (docs/SERVING.md is the full guide.)
set -e

# 1. train something small (synthetic data, runs anywhere)
python main.py --model resnet --dataset synthetic \
    --model-config "{'depth': 20}" -b 64 --epochs 2 \
    --results-dir ./results --save serving-demo

# 2. export a self-contained StableHLO artifact (weights + preprocessing
#    baked in; no framework needed at the serving site)
python - <<'PY'
from convnet_tpu.serve import Predictor
p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
              checkpoint="results/serving-demo", dtype="bf16",
              batch_size=64, input_size=32)
p.export("results/serving-demo/model.stablehlo")
PY

# 3. serve it: POST /predict with JPEG/PNG or npy bodies;
#    concurrent requests are micro-batched into one device batch
python -m convnet_tpu.serve_http \
    --exported results/serving-demo/model.stablehlo --port 8000 &
sleep 5
curl -s localhost:8000/healthz
kill %1
