"""DenseNet-BC (models/densenet.py presence [LOW] — SURVEY.md §2.2;
included for zoo completeness). Huang et al. 2017 spec."""

import jax
import jax.numpy as jnp

from convnet_tpu import ops
from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Conv2d, BatchNorm2d, Linear, MaxPool2d, AvgPool2d, GlobalAvgPool
from convnet_tpu.models.resnet import weight_decay_config

DEPTH_CFG = {121: (32, [6, 12, 24, 16]), 169: (32, [6, 12, 32, 32]),
             201: (32, [6, 12, 48, 32]), 161: (48, [6, 12, 36, 24])}


class DenseLayer(Module):
    """BN→ReLU→1×1 conv→BN→ReLU→3×3 conv, concat input."""

    def __init__(self, in_ch, growth, bn_size=4):
        self.bn1 = BatchNorm2d(in_ch)
        self.conv1 = Conv2d(in_ch, bn_size * growth, 1)
        self.bn2 = BatchNorm2d(bn_size * growth)
        self.conv2 = Conv2d(bn_size * growth, growth, 3, 1, 1)

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        y, new_state["bn1"] = self.bn1(params["bn1"], state["bn1"], x, ctx)
        y, _ = self.conv1(params["conv1"], {}, ops.relu(y), ctx)
        y, new_state["bn2"] = self.bn2(params["bn2"], state["bn2"], y, ctx)
        y, _ = self.conv2(params["conv2"], {}, ops.relu(y), ctx)
        return jnp.concatenate([x, y], axis=-1), new_state


class Transition(Module):
    def __init__(self, in_ch, out_ch):
        self.bn = BatchNorm2d(in_ch)
        self.conv = Conv2d(in_ch, out_ch, 1)
        self.pool = AvgPool2d(2, 2)

    def __call__(self, params, state, x, ctx: Context):
        y, bn_state = self.bn(params["bn"], state["bn"], x, ctx)
        y, _ = self.conv(params["conv"], {}, ops.relu(y), ctx)
        y, _ = self.pool({}, {}, y, ctx)
        return y, {"bn": bn_state}


class DenseNet(Module):
    def __init__(self, depth=121, num_classes=1000, growth=None,
                 block_config=None):
        g, cfg = DEPTH_CFG.get(depth, (32, [6, 12, 24, 16]))
        growth = growth or g
        block_config = block_config or cfg
        ch = 2 * growth
        self.stem = Sequential(
            Conv2d(3, ch, 7, 2, 3), BatchNorm2d(ch), MaxPool2d(3, 2, 1),
            names=["conv", "bn", "pool"],
        )
        stages = []
        for i, n in enumerate(block_config):
            layers = []
            for _ in range(n):
                layers.append(DenseLayer(ch, growth))
                ch += growth
            stages.append(Sequential(*layers))
            if i != len(block_config) - 1:
                stages.append(Transition(ch, ch // 2))
                ch //= 2
        self.blocks = Sequential(*stages)
        self.bn_final = BatchNorm2d(ch)
        self.pool = GlobalAvgPool()
        self.fc = Linear(ch, num_classes)
        self.input_size = 224
        self.regime = [
            {"epoch": 0, "optimizer": "SGD", "lr": 1e-1, "momentum": 0.9,
             "regularizer": weight_decay_config(1e-4)},
            {"epoch": 30, "lr": 1e-2},
            {"epoch": 60, "lr": 1e-3},
            {"epoch": 80, "lr": 1e-4},
        ]

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["stem"] = self.stem(params["stem"], state["stem"], x, ctx)
        x = ops.relu(x)
        x, new_state["blocks"] = self.blocks(params["blocks"], state["blocks"], x, ctx)
        x, new_state["bn_final"] = self.bn_final(
            params["bn_final"], state["bn_final"], x, ctx)
        x = ops.relu(x)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


def densenet(**config):
    config.pop("dataset", None)
    return DenseNet(**config)
