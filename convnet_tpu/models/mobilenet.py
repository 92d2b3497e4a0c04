"""MobileNet-v1 — depthwise-separable stack.

Rebuild of models/mobilenet.py:~10–180 (approx.): width multiplier,
optional shallow mode, embedded regimes including a large-batch /
distributed variant. Depthwise convs use ``feature_group_count`` on the
XLA path and the dedicated Pallas depthwise kernel when
``ctx.impl == 'pallas'`` (BASELINE.json "depthwise-separable conv
Pallas path").
"""

from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Linear, GlobalAvgPool
from convnet_tpu.models.resnet import ConvBN, weight_decay_config
from convnet_tpu.regimes import schedules


class DepthwiseSeparable(Module):
    """3×3 depthwise (+BN+ReLU) → 1×1 pointwise (+BN+ReLU)."""

    def __init__(self, in_ch, out_ch, stride=1):
        self.dw = ConvBN(in_ch, in_ch, 3, stride, 1, groups=in_ch)
        self.pw = ConvBN(in_ch, out_ch, 1)

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["dw"] = self.dw(params["dw"], state["dw"], x, ctx)
        x, new_state["pw"] = self.pw(params["pw"], state["pw"], x, ctx)
        return x, new_state


class MobileNet(Module):
    # (out_channels, stride) per depthwise-separable block
    CFG = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
           (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
           (1024, 1)]

    def __init__(self, num_classes=1000, width=1.0, shallow=False,
                 regime="normal", batch_size=256):
        def c(ch):
            return max(int(ch * width), 8)

        cfg = self.CFG
        if shallow:  # drop the five repeated 512 blocks
            cfg = cfg[:6] + cfg[11:]
        blocks = [ConvBN(3, c(32), 3, 2, 1)]
        in_ch = c(32)
        for out_ch, stride in cfg:
            blocks.append(DepthwiseSeparable(in_ch, c(out_ch), stride))
            in_ch = c(out_ch)
        self.features = Sequential(*blocks)
        self.pool = GlobalAvgPool()
        self.fc = Linear(in_ch, num_classes)
        self.input_size = 224
        wd = weight_decay_config(1e-4)
        if regime in ("large", "large_batch"):
            steps_per_epoch = max(1281167 // batch_size, 1)
            lr = schedules.scaled_lr(0.1, batch_size)
            self.regime = [
                {"epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                 "regularizer": wd,
                 "lr": schedules.linear_warmup_lr(0.1, lr, 5 * steps_per_epoch)},
                {"epoch": 30, "lr": lr * 1e-1},
                {"epoch": 60, "lr": lr * 1e-2},
                {"epoch": 80, "lr": lr * 1e-3},
            ]
        else:
            self.regime = [
                {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
                 "regularizer": wd},
                {"epoch": 30, "lr": 1e-2},
                {"epoch": 60, "lr": 1e-3},
                {"epoch": 80, "lr": 1e-4},
            ]

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["features"] = self.features(
            params["features"], state["features"], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


def mobilenet(**config):
    config.pop("dataset", None)
    return MobileNet(**config)
