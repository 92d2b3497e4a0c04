#!/bin/sh
# Very-large-batch training with LARS (You et al. 2017) past the
# linear-scaling regime's ~8k ceiling: layer-wise trust ratios,
# polynomial-decay LR with 5-epoch warmup, bias/BN excluded from both
# trust and weight decay. ZeRO-1 shards the momentum over the data
# axis (LARS stays exact there: per-layer norms are recovered by
# segment-reduced psums — parallel/zero.py).
# NOTE: 'epochs' appears twice on purpose — the model-config value sets
# the LARS polynomial-decay horizon (the regime is model-authored);
# --epochs sets how long the CLI trains. Change them together.
# Expected: 75.0-76.4 final top-1; contract in docs/REPRO.md#4.
# Demonstrated on-chip at scale (scripts/PERF_NOTES.md job 143):
# at B=8192, linear-scaled SGD diverges (val 0.013) while this LARS
# regime matches the B=256 equivalent-epoch curve (val 1.000) on a
# non-saturating 65k-sample task; B=16384 (chunk 64) fits and runs
# on a SINGLE v5e chip, so this script does not require a pod.
python main.py --model resnet --dataset imagenet \
    --model-config "{'depth': 50, 'regime': 'large_lars', 'batch_size': 16384, 'epochs': 90}" \
    -b 16384 --chunk-batch 16 --epochs 90 --dtype bf16 --sync-bn \
    --shard-opt-state --save resnet50-lars-b16k "$@"
