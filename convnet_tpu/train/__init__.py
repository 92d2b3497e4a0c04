from convnet_tpu.train.losses import (cross_entropy, CrossEntropyLoss, onehot, binary_cross_entropy, BCELoss)
from convnet_tpu.train.mixup import MixUp, CutMix, mixup_batch, cutmix_batch, rand_bbox_mask
from convnet_tpu.train.meters import AverageMeter, OnlineMeter, AccuracyMeter, accuracy
from convnet_tpu.train.trainer import Trainer, TrainerConfig
