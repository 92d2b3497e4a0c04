"""GoogLeNet (Inception-v1 with BatchNorm).

Rebuild of models/googlenet.py:~1–200 (approx., [MED] confidence —
SURVEY.md §2.2): BN-everywhere Inception-v1, embedded stepped regime.
Aux classifiers are omitted (BN makes them unnecessary, per BN paper).
"""

import jax.numpy as jnp

from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Linear, MaxPool2d, GlobalAvgPool, Dropout
from convnet_tpu.models.resnet import ConvBN, weight_decay_config


class Inception(Module):
    def __init__(self, in_ch, c1, c3r, c3, c5r, c5, pool_proj):
        self.b1 = ConvBN(in_ch, c1, 1)
        self.b2 = Sequential(ConvBN(in_ch, c3r, 1), ConvBN(c3r, c3, 3, 1, 1))
        self.b3 = Sequential(ConvBN(in_ch, c5r, 1), ConvBN(c5r, c5, 5, 1, 2))
        self.b4_pool = MaxPool2d(3, 1, 1)
        self.b4 = ConvBN(in_ch, pool_proj, 1)
        self.out_channels = c1 + c3 + c5 + pool_proj

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        y1, new_state["b1"] = self.b1(params["b1"], state["b1"], x, ctx)
        y2, new_state["b2"] = self.b2(params["b2"], state["b2"], x, ctx)
        y3, new_state["b3"] = self.b3(params["b3"], state["b3"], x, ctx)
        p, _ = self.b4_pool({}, {}, x, ctx)
        y4, new_state["b4"] = self.b4(params["b4"], state["b4"], p, ctx)
        return jnp.concatenate([y1, y2, y3, y4], axis=-1), new_state


class GoogLeNet(Module):
    def __init__(self, num_classes=1000, dropout=0.4):
        self.stem = Sequential(
            ConvBN(3, 64, 7, 2, 3), MaxPool2d(3, 2, 1),
            ConvBN(64, 64, 1), ConvBN(64, 192, 3, 1, 1), MaxPool2d(3, 2, 1),
        )
        self.i3a = Inception(192, 64, 96, 128, 16, 32, 32)
        self.i3b = Inception(256, 128, 128, 192, 32, 96, 64)
        self.pool3 = MaxPool2d(3, 2, 1)
        self.i4a = Inception(480, 192, 96, 208, 16, 48, 64)
        self.i4b = Inception(512, 160, 112, 224, 24, 64, 64)
        self.i4c = Inception(512, 128, 128, 256, 24, 64, 64)
        self.i4d = Inception(512, 112, 144, 288, 32, 64, 64)
        self.i4e = Inception(528, 256, 160, 320, 32, 128, 128)
        self.pool4 = MaxPool2d(3, 2, 1)
        self.i5a = Inception(832, 256, 160, 320, 32, 128, 128)
        self.i5b = Inception(832, 384, 192, 384, 48, 128, 128)
        self.pool = GlobalAvgPool()
        self.drop = Dropout(dropout)
        self.fc = Linear(1024, num_classes)
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
        for name in ["i3a", "i3b"]:
            x, new_state[name] = getattr(self, name)(
                params[name], state[name], x, ctx)
        x, _ = self.pool3({}, {}, x, ctx)
        for name in ["i4a", "i4b", "i4c", "i4d", "i4e"]:
            x, new_state[name] = getattr(self, name)(
                params[name], state[name], x, ctx)
        x, _ = self.pool4({}, {}, x, ctx)
        for name in ["i5a", "i5b"]:
            x, new_state[name] = getattr(self, name)(
                params[name], state[name], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.drop({}, {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


def googlenet(**config):
    config.pop("dataset", None)
    return GoogLeNet(**config)
