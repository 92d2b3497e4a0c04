#!/bin/sh
# ResNet-20 / CIFAR-10, He et al. stepped regime (~91.3% top-1)
# Expected: 91.0-91.6 val top-1 at epoch 200; milestone bands in
# docs/REPRO.md#2.
python main.py --model resnet --dataset cifar10 \
    --model-config "{'depth': 20}" -b 128 --epochs 200 --save resnet20 "$@"
