#!/bin/bash
# Train from a byte-offset-indexed ImageNet tar through the native
# C++ decode pipeline (native/jpegdec.cpp: GIL-free pread + libjpeg +
# RandomResizedCrop), then evaluate and export for the reference
# stack. The tar layout is <class>/<name>.jpg members (build one from
# an ImageFolder tree with plain `tar cf`); the .idx.npz byte index is
# created automatically on first use (C++ single-pass scan).
#
# Expects $DATA/imagenet_train.tar and $DATA/imagenet_val.tar.
DATA=${CONVNET_TPU_DATA:-~/datasets}

python main.py \
  --model resnet --model-config "{'depth': 50}" \
  --dataset imagenet_tar --datasets-dir "$DATA" \
  -b 256 --epochs 90 --dtype bf16 --workers 16 \
  --results-dir results --save rn50_tar

# evaluate the best checkpoint with 10-crop TTA
python main.py \
  --model resnet --model-config "{'depth': 50}" \
  --dataset imagenet_tar --datasets-dir "$DATA" \
  --evaluate results/rn50_tar/model_best.npz \
  --duplicates 10 -b 250
