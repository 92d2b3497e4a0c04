"""Inception-v3.

The reference tree carries ``models/inception*.py`` variants
([LOW]-confidence presence, SURVEY.md §2.2 "Other zoo files");
GoogLeNet (models/googlenet.py here) covers Inception-v1. This file
adds the v3 architecture (Szegedy et al. 2016) — factorized 7×1/1×7
convolutions, grid-reduction blocks — to round out the family. The
auxiliary classifier (tapped after the last 17×17 InceptionC block,
0.4-weighted per the TF-slim training convention) is available via
``aux_classifiers=True``; default off — aux heads are training-only
scaffolding the eval path never uses.
"""

import jax.numpy as jnp

from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Linear, MaxPool2d, AvgPool2d, GlobalAvgPool, Dropout
from convnet_tpu.models.resnet import ConvBN, weight_decay_config


def _cat(tensors):
    return jnp.concatenate(tensors, axis=-1)


class _MultiBranch(Module):
    """Runs named branch Sequentials and concatenates channel-wise."""

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        outs = []
        for name, branch in self.children():
            p, s = self.sub(params, state, name)
            y, s2 = branch(p, s, x, ctx)
            if s2:
                new_state[name] = s2
            outs.append(y)
        return _cat(outs), new_state


class InceptionA(_MultiBranch):
    def __init__(self, in_ch, pool_features):
        self.b1 = Sequential(ConvBN(in_ch, 64, 1))
        self.b2 = Sequential(ConvBN(in_ch, 48, 1), ConvBN(48, 64, 5, 1, 2))
        self.b3 = Sequential(ConvBN(in_ch, 64, 1), ConvBN(64, 96, 3, 1, 1),
                             ConvBN(96, 96, 3, 1, 1))
        self.b4 = Sequential(AvgPool2d(3, 1, 1), ConvBN(in_ch, pool_features, 1))
        self.out_channels = 64 + 64 + 96 + pool_features


class InceptionB(_MultiBranch):
    """Grid reduction 35→17."""

    def __init__(self, in_ch):
        self.b1 = Sequential(ConvBN(in_ch, 384, 3, 2))
        self.b2 = Sequential(ConvBN(in_ch, 64, 1), ConvBN(64, 96, 3, 1, 1),
                             ConvBN(96, 96, 3, 2))
        self.b3 = Sequential(MaxPool2d(3, 2))
        self.out_channels = 384 + 96 + in_ch


class InceptionC(_MultiBranch):
    """Factorized 7×7 (1×7 and 7×1 pairs)."""

    def __init__(self, in_ch, c7):
        self.b1 = Sequential(ConvBN(in_ch, 192, 1))
        self.b2 = Sequential(ConvBN(in_ch, c7, 1),
                             ConvBN(c7, c7, (1, 7), 1, (0, 3)),
                             ConvBN(c7, 192, (7, 1), 1, (3, 0)))
        self.b3 = Sequential(ConvBN(in_ch, c7, 1),
                             ConvBN(c7, c7, (7, 1), 1, (3, 0)),
                             ConvBN(c7, c7, (1, 7), 1, (0, 3)),
                             ConvBN(c7, c7, (7, 1), 1, (3, 0)),
                             ConvBN(c7, 192, (1, 7), 1, (0, 3)))
        self.b4 = Sequential(AvgPool2d(3, 1, 1), ConvBN(in_ch, 192, 1))
        self.out_channels = 192 * 4


class InceptionD(_MultiBranch):
    """Grid reduction 17→8."""

    def __init__(self, in_ch):
        self.b1 = Sequential(ConvBN(in_ch, 192, 1), ConvBN(192, 320, 3, 2))
        self.b2 = Sequential(ConvBN(in_ch, 192, 1),
                             ConvBN(192, 192, (1, 7), 1, (0, 3)),
                             ConvBN(192, 192, (7, 1), 1, (3, 0)),
                             ConvBN(192, 192, 3, 2))
        self.b3 = Sequential(MaxPool2d(3, 2))
        self.out_channels = 320 + 192 + in_ch


class _SplitBranch(Module):
    """stem → [branch_a, branch_b] concatenated (InceptionE inner fork)."""

    def __init__(self, stem, branch_a, branch_b):
        self.stem = stem
        self.branch_a = branch_a
        self.branch_b = branch_b

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        h, s = self.stem(params["stem"], state.get("stem", {}), x, ctx)
        if s:
            new_state["stem"] = s
        ya, sa = self.branch_a(params["branch_a"],
                               state.get("branch_a", {}), h, ctx)
        if sa:
            new_state["branch_a"] = sa
        yb, sb = self.branch_b(params["branch_b"],
                               state.get("branch_b", {}), h, ctx)
        if sb:
            new_state["branch_b"] = sb
        return _cat([ya, yb]), new_state


class InceptionE(_MultiBranch):
    def __init__(self, in_ch):
        self.b1 = Sequential(ConvBN(in_ch, 320, 1))
        self.b2 = _SplitBranch(
            Sequential(ConvBN(in_ch, 384, 1)),
            Sequential(ConvBN(384, 384, (1, 3), 1, (0, 1))),
            Sequential(ConvBN(384, 384, (3, 1), 1, (1, 0))))
        self.b3 = _SplitBranch(
            Sequential(ConvBN(in_ch, 448, 1), ConvBN(448, 384, 3, 1, 1)),
            Sequential(ConvBN(384, 384, (1, 3), 1, (0, 1))),
            Sequential(ConvBN(384, 384, (3, 1), 1, (1, 0))))
        self.b4 = Sequential(AvgPool2d(3, 1, 1), ConvBN(in_ch, 192, 1))
        self.out_channels = 320 + 768 + 768 + 192


class InceptionAux(Module):
    """v3 auxiliary head: 1×1 bottleneck → 5×5 ConvBN (SAME, replacing
    the paper's fixed valid conv on the 5×5 pooled grid so the head
    works at any trunk resolution) → global pool → linear. The linear
    subtree is named ``classifier`` for spatial_grad_reduce."""

    def __init__(self, in_ch, num_classes):
        self.conv0 = ConvBN(in_ch, 128, 1)
        self.conv1 = ConvBN(128, 768, 5, 1, 2)
        self.pool = GlobalAvgPool()
        self.classifier = Linear(768, num_classes)

    def __call__(self, params, state, x, ctx):
        new_state = dict(state)
        x, new_state["conv0"] = self.conv0(
            params["conv0"], state["conv0"], x, ctx)
        x, new_state["conv1"] = self.conv1(
            params["conv1"], state["conv1"], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.classifier(params["classifier"], {}, x, ctx)
        return x, new_state


class InceptionV3(Module):
    def __init__(self, num_classes=1000, dropout=0.5,
                 aux_classifiers=False, aux_weight=0.4):
        self.aux_weight = aux_weight
        self.stem = Sequential(
            ConvBN(3, 32, 3, 2), ConvBN(32, 32, 3), ConvBN(32, 64, 3, 1, 1),
            MaxPool2d(3, 2), ConvBN(64, 80, 1), ConvBN(80, 192, 3),
            MaxPool2d(3, 2),
        )
        self.blocks = Sequential(
            InceptionA(192, 32), InceptionA(256, 64), InceptionA(288, 64),
            InceptionB(288),
            InceptionC(768, 128), InceptionC(768, 160), InceptionC(768, 160),
            InceptionC(768, 192),
            InceptionD(768),
            InceptionE(1280), InceptionE(2048),
        )
        self.pool = GlobalAvgPool()
        self.drop = Dropout(dropout)
        self.fc = Linear(2048, num_classes)
        # aux head taps the trunk after the last 17×17 block (the
        # final InceptionC, child "7" of self.blocks)
        self.aux = InceptionAux(768, num_classes) if aux_classifiers else None
        self.input_size = 299
        self.regime = [
            {"epoch": 0, "optimizer": "SGD", "lr": 0.045, "momentum": 0.9,
             "regularizer": weight_decay_config(1e-4)},
            {"epoch": 30, "lr": 4.5e-3},
            {"epoch": 60, "lr": 4.5e-4},
        ]

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["stem"] = self.stem(params["stem"], state["stem"], x, ctx)
        if self.aux is not None and ctx.train and ctx.aux is not None:
            # run the block stack manually so the aux head can tap the
            # final 17×17 activation (same math as self.blocks(...))
            bstate = dict(state["blocks"])
            for name, layer in self.blocks.layers.items():
                p, s = self.blocks.sub(params["blocks"], state["blocks"], name)
                x, s2 = layer(p, s, x, ctx)
                if s2:
                    bstate[name] = s2
                if name == "7":
                    logits, new_state["aux"] = self.aux(
                        params["aux"], state["aux"], x, ctx)
                    ctx.aux.append((self.aux_weight, logits))
            new_state["blocks"] = bstate
        else:
            x, new_state["blocks"] = self.blocks(params["blocks"],
                                                 state["blocks"], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.drop({}, {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


def inception_v3(**config):
    config.pop("dataset", None)
    return InceptionV3(**config)
