#!/bin/sh
# MobileNet-V2 / ImageNet with cosine schedule and the Pallas kernels
# Expected: 71.5-72.2 final top-1; contract in docs/REPRO.md#5.
python main.py --model mobilenet_v2 --dataset imagenet \
    --model-config "{'regime': 'cosine'}" -b 256 --epochs 150 \
    --dtype bf16 --impl pallas --save mnv2 "$@"
