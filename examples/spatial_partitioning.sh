#!/bin/sh
# Spatial partitioning: shard activation height over 2 devices per
# data-parallel replica (2-D mesh) — for activation footprints beyond
# one chip's HBM (high resolution / large per-replica batch)
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 101}" -b 512 --dtype bf16 \
    --sync-bn --spatial 2 --save resnet101-sp2 "$@"
