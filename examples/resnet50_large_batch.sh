#!/bin/sh
# Large-batch regime: linear LR scaling + 5-epoch warmup (Goyal et al.),
# batch 4096 with gradient accumulation over 4 chunks, cross-replica BN
# Expected: 75.7-76.3 final top-1; contract in docs/REPRO.md#3.
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 50, 'regime': 'large', 'batch_size': 4096}" \
    -b 4096 --chunk-batch 4 --epochs 90 --dtype bf16 --sync-bn \
    --save resnet50-b4k "$@"
