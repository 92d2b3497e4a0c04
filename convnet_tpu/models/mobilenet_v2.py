"""MobileNet-V2 — inverted residuals + linear bottlenecks.

Demanded by BASELINE.json config #3 ("MobileNet-V2 ImageNet,
depthwise-separable conv Pallas path"); upstream presence is [LOW/MED]
(SURVEY.md §2.2 note) so this is built to the Sandler et al. 2018 spec
rather than to a reference file.
"""

import jax

from convnet_tpu import ops
from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import Linear, GlobalAvgPool, Dropout
from convnet_tpu.models.resnet import weight_decay_config
from convnet_tpu.regimes import schedules


from convnet_tpu.models.resnet import ConvBN


class ConvBNReLU6(ConvBN):
    def __init__(self, in_ch, out_ch, kernel, stride=1, padding=0, groups=1,
                 relu6=True):
        super().__init__(in_ch, out_ch, kernel, stride, padding,
                         groups=groups, relu=relu6,
                         act="relu6" if relu6 else "none")

    def __call__(self, params, state, x, ctx: Context):
        if self._fusable(ctx):
            return super().__call__(params, state, x, ctx)
        x, _ = self.conv(params["conv"], {}, x, ctx)
        x, bn_state = self.bn(params["bn"], state["bn"], x, ctx)
        if self.relu:
            x = ops.relu6(x)
        return x, {"bn": bn_state}


class InvertedResidual(Module):
    def __init__(self, in_ch, out_ch, stride, expand_ratio):
        hidden = int(round(in_ch * expand_ratio))
        self.use_res = stride == 1 and in_ch == out_ch
        self.stride = stride
        self.hidden = hidden
        self.has_expand = expand_ratio != 1
        layers = []
        if self.has_expand:
            layers.append(ConvBNReLU6(in_ch, hidden, 1))
        layers.append(ConvBNReLU6(hidden, hidden, 3, stride, 1, groups=hidden))
        layers.append(ConvBNReLU6(hidden, out_ch, 1, relu6=False))  # linear
        self.block = Sequential(*layers)

    def _fused_ok(self, ctx):
        # Opt-in (CONVNET_TPU_FUSED_MBCONV=1), inference only, and
        # measured a model-level LOSS on v5e (0.86x serving, job 118)
        # despite standalone per-block wins at 576ch — standalone
        # timings are dispatch-floor-polluted and in-model XLA fuses
        # tighter. Kept as the tested escape hatch for backends where
        # cross-conv fusion is weaker. Eligibility: hidden width must
        # keep 4D block DMA efficient (>=256 channels; 64-byte rows at
        # 32ch run at ~52 GB/s — jobs 104-115) and Mosaic must compile
        # (960ch crashes the remote compiler). Training stays XLA: the
        # BN stats passes re-read the input and measured 0.42-0.81x.
        import os
        if os.environ.get("CONVNET_TPU_FUSED_MBCONV") != "1":
            return False
        if ctx.train or ctx.quant is not None or ctx.spatial_axis is not None:
            return False
        from convnet_tpu.ops.pallas import mbconv
        return mbconv.supported(self.stride, 3) and 256 <= self.hidden <= 640

    def __call__(self, params, state, x, ctx: Context):
        if self._fused_ok(ctx):
            from convnet_tpu.ops.pallas import mbconv
            names = list(self.block.layers.keys())
            kids = list(self.block.layers.values())
            bp, bs = params["block"], state["block"]

            def fold(i):
                cb = kids[i]
                p, st = bp[names[i]], bs[names[i]]
                s, t = mbconv._fold(p["bn"]["scale"], p["bn"]["bias"],
                                    st["bn"]["mean"], st["bn"]["var"],
                                    cb.bn.eps)
                return p["conv"]["w"], s, t

            if self.has_expand:
                we, s1, t1 = fold(0)
                we = we.reshape(we.shape[-2], we.shape[-1])
                i_dw = 1
            else:
                we = s1 = t1 = None
                i_dw = 0
            wd, s2, t2 = fold(i_dw)
            wp, s3, t3 = fold(i_dw + 1)
            y = mbconv.mbconv_infer(
                x, we, s1, t1, wd, s2, t2,
                wp.reshape(wp.shape[-2], wp.shape[-1]), s3, t3,
                residual=self.use_res,
                interpret=jax.devices()[0].platform == "cpu")
            return y, dict(state)
        out, new_block_state = self.block(params["block"], state["block"], x, ctx)
        if self.use_res:
            out = out + x
        return out, {"block": new_block_state}


class MobileNetV2(Module):
    # t (expansion), c (channels), n (repeats), s (stride)
    CFG = [
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    ]

    def __init__(self, num_classes=1000, width=1.0, dropout=0.2,
                 regime="normal", batch_size=256, epochs=150):
        def c(ch):
            v = max(int(ch * width + 4) // 8 * 8, 8)  # round to multiple of 8
            if v < 0.9 * ch * width:
                v += 8
            return v

        in_ch = c(32)
        blocks = [ConvBNReLU6(3, in_ch, 3, 2, 1)]
        for t, ch, n, s in self.CFG:
            out_ch = c(ch)
            for i in range(n):
                blocks.append(InvertedResidual(in_ch, out_ch,
                                               s if i == 0 else 1, t))
                in_ch = out_ch
        last = c(1280) if width > 1.0 else 1280
        blocks.append(ConvBNReLU6(in_ch, last, 1))
        self.features = Sequential(*blocks)
        self.pool = GlobalAvgPool()
        self.drop = Dropout(dropout)
        self.fc = Linear(last, num_classes)
        self.input_size = 224
        steps_per_epoch = max(1281167 // batch_size, 1)
        wd = weight_decay_config(4e-5)
        if regime == "cosine":
            self.regime = [{
                "epoch": 0, "optimizer": "SGD", "momentum": 0.9,
                "regularizer": wd,
                "lr": schedules.cosine_lr(0.05 * batch_size / 256,
                                          epochs * steps_per_epoch,
                                          warmup_steps=steps_per_epoch),
            }]
        else:
            # RMSprop-style regime per the MobileNetV2 paper lineage,
            # expressed with this framework's exponential epoch decay
            self.regime = [{
                "epoch": 0, "optimizer": "RMSprop", "alpha": 0.9,
                "momentum": 0.9, "eps": 1.0,
                "regularizer": wd,
                "lr": schedules.step_decay_lr(0.045, 0.98, 1),
            }]

    def __call__(self, params, state, x, ctx: Context):
        new_state = dict(state)
        x, new_state["features"] = self.features(
            params["features"], state["features"], x, ctx)
        x, _ = self.pool({}, {}, x, ctx)
        x, _ = self.drop({}, {}, x, ctx)
        x, _ = self.fc(params["fc"], {}, x, ctx)
        return x, new_state


def mobilenet_v2(**config):
    config.pop("dataset", None)
    return MobileNetV2(**config)
