#!/bin/sh
# MobileNet-V2 / ImageNet with cosine schedule and the Pallas kernels
python main.py --model mobilenet_v2 --dataset imagenet \
    --model-config "{'regime': 'cosine'}" -b 256 --epochs 150 \
    --dtype bf16 --impl pallas --save mnv2 "$@"
