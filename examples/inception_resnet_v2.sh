#!/bin/sh
# Inception-ResNet-v2 / ImageNet (299x299, Inception SGD schedule)
python main.py --model inception_resnet_v2 --dataset imagenet \
    -b 128 --epochs 90 --dtype bf16 --save irv2 "$@"
