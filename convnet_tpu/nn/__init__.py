from convnet_tpu.nn.layers import (
    Conv2d,
    BatchNorm2d,
    Linear,
    ReLU,
    ReLU6,
    HardSwish,
    Sigmoid,
    Dropout,
    Flatten,
    MaxPool2d,
    AvgPool2d,
    GlobalAvgPool,
    LocalResponseNorm,
)
from convnet_tpu.nn.se import SEBlock, SESwishBlock
from convnet_tpu.nn.checkpoint import CheckpointModule
from convnet_tpu.core.module import Sequential, Identity, Module, Context
