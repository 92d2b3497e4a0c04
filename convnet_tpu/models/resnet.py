"""ResNet family — the flagship of the zoo.

TPU-native rebuild of models/resnet.py:~1–500 (approx., unverified —
SURVEY.md §2.2): ImageNet ResNet-18/34/50/101/152 with width/groups
(ResNeXt-style), CIFAR ResNet-20/32/44/56/110 (+wide), optional SE
blocks, optional activation checkpointing, zero-init residual option,
and **embedded regimes**: the model object carries its own optimizer
schedule (``model.regime``) and optional data-pipeline schedule
(``model.data_regime``), so the driver has no per-model logic
(SURVEY.md §1 "regimes").

Layout: NHWC activations, HWIO kernels. The conv→BN→ReLU(→SE)→add
block is the Pallas fusion target (ops/pallas/); blocks route through
fused kernels when ``ctx.impl == 'pallas'``.
"""

from __future__ import annotations

import jax

from convnet_tpu import ops
from convnet_tpu.core import initializers as init
from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import (
    Conv2d, BatchNorm2d, Linear, MaxPool2d, GlobalAvgPool, SEBlock,
    CheckpointModule,
)
from convnet_tpu.regimes import schedules


def weight_decay_config(value=1e-4):
    """Reference models attach this spec (models/resnet.py:~30–45 approx.):
    decoupled weight decay filtered to exclude biases and BN params —
    the filtering is the default ``wd_mask`` in this framework."""
    return {"name": "WeightDecay", "value": value}


class ConvBN(Module):
    """conv → BN (→ ReLU) — the fusable unit.

    Inference with ``ctx.impl == 'pallas'`` routes pointwise convs
    through the fused MXU kernel (ops/pallas/matmul_fused.py): one
    kernel computes conv + folded BN + activation.
    """

    def __init__(self, in_ch, out_ch, kernel, stride=1, padding=0, groups=1,
                 relu=True, zero_init_gamma=False, act="relu"):
        self.conv = Conv2d(in_ch, out_ch, kernel, stride, padding, groups=groups)
        self.bn = BatchNorm2d(out_ch,
                              gamma_init=init.zeros if zero_init_gamma else init.ones)
        self.relu = relu
        self.act = act if relu else "none"

    def _fusable(self, ctx):
        # opt-in (CONVNET_TPU_PALLAS_FUSED=1): at full-model scale the
        # standalone fused kernel breaks XLA's own conv+epilogue fusion
        # chains — measured 3x slower RN50 inference on v5e
        # (scripts/PERF_NOTES.md); it remains the guaranteed-fusion
        # escape hatch for backends without epilogue pattern-matching.
        import os
        if os.environ.get("CONVNET_TPU_PALLAS_FUSED") != "1":
            return False
        return (not ctx.train and ctx.impl == "pallas"
                and self.conv.kernel_size == (1, 1)
                and self.conv.stride in (1, (1, 1))
                and self.conv.groups == 1)

    def __call__(self, params, state, x, ctx: Context):
        if self._fusable(ctx):
            from convnet_tpu.ops.pallas.matmul_fused import conv1x1_bn_act
            bn_p, bn_s = params["bn"], state["bn"]
            inv = jax.lax.rsqrt(bn_s["var"] + self.bn.eps)
            scale = bn_p["scale"].astype(jax.numpy.float32) * inv
            shift = (bn_p["bias"].astype(jax.numpy.float32)
                     - bn_s["mean"] * scale)
            y = conv1x1_bn_act(
                x, params["conv"]["w"], scale, shift, act=self.act,
                interpret=jax.devices()[0].platform == "cpu")
            return y, state
        x, _ = self.conv(params["conv"], {}, x, ctx)
        x, bn_state = self.bn(params["bn"], state["bn"], x, ctx)
        if self.relu:
            x = ops.relu(x)
        return x, {"bn": bn_state}


class BasicBlock(Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 se_reduction=None, zero_init_residual=False):
        self.cb1 = ConvBN(inplanes, planes, 3, stride, 1, groups=groups)
        self.cb2 = ConvBN(planes, planes, 3, 1, 1, groups=groups, relu=False,
                          zero_init_gamma=zero_init_residual)
        self.se = SEBlock(planes, se_reduction) if se_reduction else None
        self.downsample = downsample

    def __call__(self, params, state, x, ctx: Context):
        identity = x
        new_state = dict(state)
        out, new_state["cb1"] = self.cb1(params["cb1"], state["cb1"], x, ctx)
        out, new_state["cb2"] = self.cb2(params["cb2"], state["cb2"], out, ctx)
        if self.se is not None:
            out, _ = self.se(params["se"], {}, out, ctx)
        if self.downsample is not None:
            identity, new_state["downsample"] = self.downsample(
                params["downsample"], state["downsample"], x, ctx)
        out = ops.relu(out + identity)
        return out, new_state


class Bottleneck(Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 se_reduction=None, zero_init_residual=False):
        width = planes
        self.cb1 = ConvBN(inplanes, width, 1)
        self.cb2 = ConvBN(width, width, 3, stride, 1, groups=groups)
        self.cb3 = ConvBN(width, planes * self.expansion, 1, relu=False,
                          zero_init_gamma=zero_init_residual)
        self.se = SEBlock(planes * self.expansion, se_reduction) if se_reduction else None
        self.downsample = downsample

    def __call__(self, params, state, x, ctx: Context):
        identity = x
        new_state = dict(state)
        out, new_state["cb1"] = self.cb1(params["cb1"], state["cb1"], x, ctx)
        out, new_state["cb2"] = self.cb2(params["cb2"], state["cb2"], out, ctx)
        out, new_state["cb3"] = self.cb3(params["cb3"], state["cb3"], out, ctx)
        if self.se is not None:
            out, _ = self.se(params["se"], {}, out, ctx)
        if self.downsample is not None:
            identity, new_state["downsample"] = self.downsample(
                params["downsample"], state["downsample"], x, ctx)
        out = ops.relu(out + identity)
        return out, new_state


def _make_layer(block_cls, inplanes, planes, num_blocks, stride=1, groups=1,
                se_reduction=None, zero_init_residual=False, remat=False):
    downsample = None
    out_ch = planes * block_cls.expansion
    if stride != 1 or inplanes != out_ch:
        downsample = ConvBN(inplanes, out_ch, 1, stride, relu=False)
    blocks = []
    for i in range(num_blocks):
        b = block_cls(inplanes if i == 0 else out_ch, planes,
                      stride=stride if i == 0 else 1,
                      downsample=downsample if i == 0 else None,
                      groups=groups, se_reduction=se_reduction,
                      zero_init_residual=zero_init_residual)
        blocks.append(CheckpointModule(b) if remat else b)
    return Sequential(*blocks), out_ch


class ResNet(Module):
    """Shared trunk: stem is provided by the ImageNet/CIFAR subclasses."""

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["stem"] = self.stem(params["stem"], state["stem"], x, ctx)
        x, new_state["layers"] = self.layers(params["layers"], state["layers"], x, ctx)
        x, _ = self.pool(params.get("pool", {}), {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


class ResNet_imagenet(ResNet):
    # depth → (block, per-stage counts); models/resnet.py:~260–380 approx.
    DEPTHS = {
        18: (BasicBlock, [2, 2, 2, 2]),
        34: (BasicBlock, [3, 4, 6, 3]),
        50: (Bottleneck, [3, 4, 6, 3]),
        101: (Bottleneck, [3, 4, 23, 3]),
        152: (Bottleneck, [3, 8, 36, 3]),
    }

    def __init__(self, depth=50, num_classes=1000, width=None, groups=1,
                 se_reduction=None, zero_init_residual=False, remat=False,
                 regime="normal", batch_size=256, epochs=90, block=None,
                 layers=None, stem="conv7"):
        if block is None or layers is None:
            if depth not in self.DEPTHS:
                raise ValueError(
                    f"unknown ImageNet ResNet depth {depth} (have "
                    f"{sorted(self.DEPTHS)}); CIFAR-style 6n+2 depths "
                    f"(8, 20, 32, ...) need dataset='cifar10'/'cifar100' "
                    f"in the model config")
            block, layers = self.DEPTHS[depth]
        width = width or [64, 128, 256, 512]
        if stem == "s2d":
            # space-to-depth stem: 2×2 s2d (3→12 ch) + 4×4/1 conv with
            # asymmetric pad — the stride-2 7×7 conv re-expressed on a
            # channel-rich input that tiles onto the MXU
            from convnet_tpu.nn.layers import SpaceToDepth
            self.stem = Sequential(
                SpaceToDepth(2),
                ConvBN(12, width[0], 4, 1, ((2, 1), (2, 1))),
                MaxPool2d(3, 2, 1),
                names=["s2d", "conv1", "maxpool"],
            )
        else:
            self.stem = Sequential(
                ConvBN(3, width[0], 7, 2, 3),
                MaxPool2d(3, 2, 1),
                names=["conv1", "maxpool"],
            )
        stages = []
        inplanes = width[0]
        for i, (planes, n) in enumerate(zip(width, layers)):
            # remat: bool (all stages) or a collection of stage names,
            # e.g. remat=('layer1',) checkpoints only the early
            # high-resolution blocks — activation memory concentrates
            # there, so selective remat trades the least FLOPs for the
            # most memory (round-2 VERDICT weak #4 / B=512 experiment)
            stage_remat = (remat if isinstance(remat, bool)
                           else f"layer{i + 1}" in remat)
            stage, inplanes = _make_layer(
                block, inplanes, planes, n, stride=1 if i == 0 else 2,
                groups=groups, se_reduction=se_reduction,
                zero_init_residual=zero_init_residual, remat=stage_remat)
            stages.append(stage)
        self.layers = Sequential(*stages,
                                 names=[f"layer{i+1}" for i in range(len(stages))])
        self.pool = GlobalAvgPool()
        self.fc = Linear(inplanes, num_classes)
        self.input_size = 224
        self.regime = self._make_regime(regime, batch_size, epochs)
        if regime == "mixmatch":
            # "Mix & Match" progressive resizing: the model authors its
            # own data-pipeline schedule (SURVEY.md §1 — model-owned
            # data_regime); smaller images early, full size for the
            # final third. Eval always runs at full resolution.
            self.data_regime = [
                {"epoch": 0, "input_size": 128},
                {"epoch": int(epochs * 0.3), "input_size": 160},
                {"epoch": int(epochs * 0.6), "input_size": 192},
                {"epoch": int(epochs * 0.8), "input_size": 224},
            ]

    def _make_regime(self, name, batch_size, epochs):
        wd = weight_decay_config(1e-4)
        if name in ("large", "large_batch"):
            # Goyal-style linear scaling + 5-epoch warmup ramp
            steps_per_epoch = max(1281167 // batch_size, 1)
            lr = schedules.scaled_lr(0.1, batch_size)
            return [
                {"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                 "regularizer": wd,
                 "lr": schedules.linear_warmup_lr(0.1, lr, 5 * steps_per_epoch)},
                {"epoch": 30, "lr": lr * 1e-1},
                {"epoch": 60, "lr": lr * 1e-2},
                {"epoch": 80, "lr": lr * 1e-3},
            ]
        if name in ("large_lars", "lars"):
            # LARS past the linear-scaling regime's ~8k-batch ceiling
            # (You et al. 2017; the MLPerf RN50 convention: polynomial
            # decay power 2, 5-epoch warmup, wd inside the trust ratio,
            # bias/BN excluded). lr anchored at the published 4k-batch
            # operating point and scaled linearly.
            steps_per_epoch = max(1281167 // batch_size, 1)
            return [
                {"epoch": 0, "optimizer": "LARS", "momentum": 0.9,
                 "weight_decay": 1e-4, "trust_coef": 0.001,
                 "lr": schedules.polynomial_lr(
                     7.4 * batch_size / 4096,
                     epochs * steps_per_epoch, power=2.0,
                     warmup_steps=5 * steps_per_epoch)},
            ]
        if name == "small":
            # small-batch regime ("Train longer, generalize better" lineage)
            return [
                {"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                 "regularizer": wd, "lr": 0.1 * batch_size / 256},
                {"epoch": 30, "lr": 0.01 * batch_size / 256},
                {"epoch": 60, "lr": 0.001 * batch_size / 256},
                {"epoch": 80, "lr": 0.0001 * batch_size / 256},
            ]
        if name == "mixmatch":
            # optimizer schedule identical to 'normal'; the data_regime
            # (set in __init__) carries the resizing schedule
            return [
                {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
                 "regularizer": wd},
                {"epoch": 30, "lr": 1e-2},
                {"epoch": 60, "lr": 1e-3},
                {"epoch": 80, "lr": 1e-4},
            ]
        if name == "cosine":
            steps_per_epoch = max(1281167 // batch_size, 1)
            return [{"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                     "regularizer": wd,
                     "lr": schedules.cosine_lr(
                         schedules.scaled_lr(0.1, batch_size),
                         epochs * steps_per_epoch,
                         warmup_steps=5 * steps_per_epoch)}]
        # 'normal': the classic 90-epoch stepped schedule
        return [
            {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
             "regularizer": wd},
            {"epoch": 30, "lr": 1e-2},
            {"epoch": 60, "lr": 1e-3},
            {"epoch": 80, "lr": 1e-4},
        ]


class ResNet_cifar(ResNet):
    """CIFAR ResNet-6n+2 (models/resnet.py:~380–450 approx.)."""

    def __init__(self, depth=20, num_classes=10, width_factor=1,
                 se_reduction=None, zero_init_residual=False, remat=False,
                 block=BasicBlock):
        n = (depth - 2) // 6
        w = 16 * width_factor
        self.stem = ConvBN(3, w, 3, 1, 1)
        stage1, c1 = _make_layer(block, w, w, n, 1,
                                 se_reduction=se_reduction,
                                 zero_init_residual=zero_init_residual,
                                 remat=remat)
        stage2, c2 = _make_layer(block, c1, 2 * w, n, 2,
                                 se_reduction=se_reduction,
                                 zero_init_residual=zero_init_residual,
                                 remat=remat)
        stage3, c3 = _make_layer(block, c2, 4 * w, n, 2,
                                 se_reduction=se_reduction,
                                 zero_init_residual=zero_init_residual,
                                 remat=remat)
        self.layers = Sequential(stage1, stage2, stage3,
                                 names=["layer1", "layer2", "layer3"])
        self.pool = GlobalAvgPool()
        self.fc = Linear(c3, num_classes)
        self.input_size = 32
        # He et al. CIFAR schedule as embedded in the reference
        self.regime = [
            {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
             "regularizer": weight_decay_config(1e-4)},
            {"epoch": 81, "lr": 1e-2},
            {"epoch": 122, "lr": 1e-3},
            {"epoch": 164, "lr": 1e-4},
        ]


def resnet(**config):
    """Factory with the reference's dataset/depth dispatch
    (models/resnet.py:~450–500 approx.)."""
    dataset = config.pop("dataset", "imagenet")
    if "cifar" in str(dataset):
        num_classes = config.pop("num_classes", 100 if "100" in str(dataset) else 10)
        config.setdefault("depth", 20)
        return ResNet_cifar(num_classes=num_classes, **config)
    num_classes = config.pop("num_classes", 1000)
    config.setdefault("depth", 50)
    return ResNet_imagenet(num_classes=num_classes, **config)


def resnet_se(**config):
    config.setdefault("se_reduction", 16)
    return resnet(**config)


class ResNeXtBottleneck(Bottleneck):
    """ResNeXt bottleneck: wide grouped 3×3 with expansion 2
    (so 32×4d stage widths 128/256/512/1024 → outputs 256/…/2048)."""
    expansion = 2


def resnext(**config):
    """ResNeXt (the reference's width/groups knobs on models/resnet.py;
    cardinality 32, 32×4d widths by default)."""
    config.setdefault("groups", 32)
    config.setdefault("depth", 50)
    config.setdefault("width", [128, 256, 512, 1024])
    config.setdefault("block", ResNeXtBottleneck)
    config.setdefault("layers", ResNet_imagenet.DEPTHS[config["depth"]][1])
    return resnet(**config)


def wide_resnet(**config):
    """Wide ResNet for CIFAR (width_factor-scaled ResNet_cifar — the
    reference's 'wide variants', SURVEY.md §2.2). depth obeys 6n+2."""
    config.setdefault("dataset", "cifar10")
    config.setdefault("width_factor", 4)
    config.setdefault("depth", 26)
    return resnet(**config)
