#!/bin/sh
# "Augment your batch" (CVPR'20): each sample appears 4x with different
# augmentations; adaptive gradient-norm rescaling
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 50}" -b 64 --duplicates 4 \
    --adapt-grad-norm 100 --dtype bf16 --save resnet50-ba "$@"
