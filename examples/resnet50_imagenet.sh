#!/bin/sh
# ResNet-50 / ImageNet, classic 90-epoch regime, bf16, all local chips
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 50}" -b 256 --epochs 90 --dtype bf16 \
    --label-smoothing 0.1 --save resnet50 "$@"
