#!/bin/sh
# Multi-host data-parallel (run on every host; RANK/N/COORD from env)
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 101}" -b 1024 --dtype bf16 --sync-bn \
    --dist-init "${COORD:?}" --dist-rank "${RANK:?}" \
    --dist-world-size "${N:?}" --save resnet101-multihost "$@"
