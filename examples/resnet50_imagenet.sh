#!/bin/sh
# ResNet-50 / ImageNet, classic 90-epoch regime, bf16, all local chips
# Expected: 76.1-76.5 val top-1 at epoch 90; milestone bands at
# epochs 5/29/35/60 in docs/REPRO.md#1 (file a run outside its band).
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 50}" -b 256 --epochs 90 --dtype bf16 \
    --label-smoothing 0.1 --save resnet50 "$@"
