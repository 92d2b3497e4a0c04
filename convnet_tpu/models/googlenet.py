"""GoogLeNet (Inception-v1 with BatchNorm).

Rebuild of models/googlenet.py:~1–200 (approx., [MED] confidence —
SURVEY.md §2.2): BN-everywhere Inception-v1, embedded stepped regime.
Auxiliary classifiers (Szegedy et al. 2014 §5, 0.3-weighted training
heads after inception 4a and 4d) are available via
``aux_classifiers=True``; default off, since with BN everywhere the
aux gradient injection is unnecessary (per the BN paper) and the
heads are training-only scaffolding the eval path never uses.
"""

import jax.numpy as jnp

from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Linear, MaxPool2d, GlobalAvgPool, Dropout, ReLU
from convnet_tpu.models.resnet import ConvBN, weight_decay_config


class AuxHead(Module):
    """Auxiliary classifier head.

    Input-size-robust variant of the paper's head (5×5/3 avg-pool →
    4×4 flatten): a 1×1 ConvBN bottleneck followed by GLOBAL average
    pooling, so the head works at any trunk resolution (tests run
    ImageNet models at 64²) and under spatial sharding (GlobalAvgPool
    reduces over the spatial mesh axis). The classifier subtree is
    named ``classifier`` so spatial_grad_reduce treats its gradients
    as replicated-full, like every other zoo head.
    """

    def __init__(self, in_ch, num_classes, hidden=1024, dropout=0.7):
        self.conv = ConvBN(in_ch, 128, 1)
        self.pool = GlobalAvgPool()
        self.classifier = Sequential(
            Linear(128, hidden), ReLU(), Dropout(dropout),
            Linear(hidden, num_classes),
            names=["fc1", "relu", "drop", "fc2"])

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["conv"] = self.conv(params["conv"], state["conv"], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.classifier(params["classifier"], {}, x, ctx)
        return x, new_state


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
    def __init__(self, num_classes=1000, dropout=0.4,
                 aux_classifiers=False, aux_weight=0.3):
        self.aux_weight = aux_weight
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
        # training-only aux heads tap the trunk after 4a (512ch) and
        # 4d (528ch), matching the paper's placement
        self.aux1 = AuxHead(512, num_classes) if aux_classifiers else None
        self.aux2 = AuxHead(528, num_classes) if aux_classifiers else None
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
        collect_aux = (self.aux1 is not None and ctx.train
                       and ctx.aux is not None)
        for name in ["i4a", "i4b", "i4c", "i4d", "i4e"]:
            x, new_state[name] = getattr(self, name)(
                params[name], state[name], x, ctx)
            if collect_aux and name in ("i4a", "i4d"):
                head = self.aux1 if name == "i4a" else self.aux2
                hname = "aux1" if name == "i4a" else "aux2"
                logits, new_state[hname] = head(
                    params[hname], state[hname], x, ctx)
                ctx.aux.append((self.aux_weight, logits))
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
