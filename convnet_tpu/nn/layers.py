"""Leaf layer modules wrapping ops/ with parameters and state.

These are the TPU-native counterparts of the torch layers the reference
zoo is built from (``nn.Conv2d``, ``nn.BatchNorm2d``, ``nn.Linear``,
pooling, dropout — SURVEY.md §2.1 row 1). Parameters live in fp32
(policy.param_dtype) and are cast to compute dtype at use; BN running
stats always fp32 (policy.stat_dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from convnet_tpu.core import initializers as init
from convnet_tpu.core.dtypes import DEFAULT_POLICY
from convnet_tpu.core.module import Module, Context
from convnet_tpu import ops


class Conv2d(Module):
    """NHWC conv layer; weight HWIO. ``impl='pallas'`` contexts route
    fused variants at the block level (nn/blocks), not here."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=False,
                 weight_init=init.kaiming_normal):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size if isinstance(kernel_size, tuple) else (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, key, policy=DEFAULT_POLICY):
        kh, kw = self.kernel_size
        wkey, bkey = jax.random.split(key)
        shape = (kh, kw, self.in_channels // self.groups, self.out_channels)
        params = {"w": self.weight_init(wkey, shape, policy.param_dtype)}
        if self.use_bias:
            fan_in = kh * kw * self.in_channels // self.groups
            bound = 1.0 / max(fan_in, 1) ** 0.5
            params["b"] = jax.random.uniform(
                bkey, (self.out_channels,), policy.param_dtype, -bound, bound)
        return params, {}

    def _pallas_depthwise_ok(self, ctx):
        # opt-in (CONVNET_TPU_PALLAS_DEPTHWISE=1): measured on v5e,
        # XLA's depthwise conv is ~6x faster than the Pallas kernel at
        # MobileNet-V2 scale (parity-reshape relayouts dominate); the
        # kernel stays available and tested as the escape hatch for
        # backends where XLA's depthwise lowering is weak.
        import os
        if os.environ.get("CONVNET_TPU_PALLAS_DEPTHWISE") != "1":
            return False
        if ctx.impl != "pallas" or self.dilation not in (1, (1, 1)):
            return False
        if not (self.groups == self.in_channels == self.out_channels):
            return False
        s = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        return max(s) <= 2 and isinstance(self.padding, int)

    def _pallas_grouped_ok(self, ctx, x_shape):
        # Eval-path ResNeXt grouped conv (VERDICT r4 #2; jobs 137/140):
        # the Pallas dense-tile kernel wins 1.26x over XLA's fgc
        # lowering ONLY forward-only and ONLY at the stage-1 shape
        # (H=56, C=128, stride 1, cg=4) — training (fwd+bwd) measured
        # 0.74x there and worse elsewhere (job 140), so this routes
        # eval/serving traces exclusively.
        if ctx.impl != "pallas" or ctx.train or self.groups <= 1:
            return False
        s = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        if s != (1, 1) or not isinstance(self.padding, int):
            return False
        if x_shape[1] != 56 or x_shape[3] != 128:
            return False
        from convnet_tpu.ops.pallas import grouped as _g
        kh, kw = self.kernel_size
        return _g.supported(
            x_shape, (kh, kw, self.in_channels // self.groups,
                      self.out_channels), self.groups, 1, self.dilation)

    def __call__(self, params, state, x, ctx: Context):
        if ctx.quant is not None:
            from convnet_tpu.nn import quant as _quant
            if _quant.conv_eligible(self, x.shape):
                if ctx.quant.mode == "calibrate":
                    # observe the float range, compute the bf16 forward
                    ctx.quant.record(jnp.max(jnp.abs(
                        x.astype(jnp.float32))))
                else:
                    y = _quant.conv1x1_int8(x, params["w"],
                                            ctx.quant.next_scale())
                    if self.use_bias:
                        y = (y.astype(jnp.float32)
                             + params["b"].astype(jnp.float32)).astype(y.dtype)
                    return y, state
        if ctx.spatial_axis is not None:
            from convnet_tpu.parallel.spatial import conv2d_spatial
            y = conv2d_spatial(x, params["w"], stride=self.stride,
                               padding=self.padding, dilation=self.dilation,
                               groups=self.groups,
                               axis_name=ctx.spatial_axis)
        elif self._pallas_grouped_ok(ctx, x.shape):
            from convnet_tpu.ops.pallas.grouped import grouped_conv_pallas
            y = grouped_conv_pallas(
                x, params["w"], stride=self.stride, padding=self.padding,
                groups=self.groups,
                interpret=jax.devices()[0].platform == "cpu")
        elif self._pallas_depthwise_ok(ctx):
            from convnet_tpu.ops.pallas.depthwise import depthwise_conv_pallas
            y = depthwise_conv_pallas(
                x, params["w"].astype(x.dtype), self.stride, self.padding,
                interpret=jax.devices()[0].platform == "cpu")
        else:
            y = ops.conv2d(x, params["w"], stride=self.stride,
                           padding=self.padding, dilation=self.dilation,
                           groups=self.groups)
        if self.use_bias:
            y = (y.astype(jnp.float32) + params["b"].astype(jnp.float32)).astype(y.dtype)
        return y, state


class BatchNorm2d(Module):
    """BN over NHWC channels; running stats in ``state``. Cross-replica
    statistics when ``ctx.axis_name`` is set (SURVEY.md §2.3 row 3)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 gamma_init=init.ones):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.gamma_init = gamma_init

    def init(self, key, policy=DEFAULT_POLICY):
        params = {}
        if self.affine:
            params = {
                "scale": self.gamma_init(key, (self.num_features,), policy.param_dtype),
                "bias": jnp.zeros((self.num_features,), policy.param_dtype),
            }
        state = {
            "mean": jnp.zeros((self.num_features,), policy.stat_dtype),
            "var": jnp.ones((self.num_features,), policy.stat_dtype),
        }
        return params, state

    def __call__(self, params, state, x, ctx: Context):
        scale = params.get("scale") if self.affine else None
        bias = params.get("bias") if self.affine else None
        if ctx.train:
            # moments MUST reduce over the spatial axis when H is
            # sharded (batch stats span the full image); the data axis
            # joins only under sync-BN (ctx.axis_name)
            axis_size = 1
            for a in (ctx.spatial_axis, ctx.axis_name):
                if a is not None:
                    axis_size *= jax.lax.axis_size(a)
            y, mean, var = ops.batch_norm_train(
                x, scale, bias, state["mean"], state["var"],
                momentum=self.momentum, eps=self.eps,
                axis_name=ctx.axis_name,
                spatial_axis=ctx.spatial_axis,
                axis_size=axis_size,
            )
            return y, {"mean": mean, "var": var}
        y = ops.batch_norm_inference(x, scale, bias, state["mean"],
                                     state["var"], eps=self.eps)
        return y, state


class Linear(Module):
    def __init__(self, in_features, out_features, bias=True,
                 weight_init=init.torch_linear_default):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.weight_init = weight_init

    def init(self, key, policy=DEFAULT_POLICY):
        wkey, bkey = jax.random.split(key)
        params = {"w": self.weight_init(wkey, (self.in_features, self.out_features),
                                        policy.param_dtype)}
        if self.use_bias:
            bound = 1.0 / max(self.in_features, 1) ** 0.5
            params["b"] = jax.random.uniform(
                bkey, (self.out_features,), policy.param_dtype, -bound, bound)
        return params, {}

    def __call__(self, params, state, x, ctx: Context):
        return ops.linear(x, params["w"], params.get("b")), state


class _Stateless(Module):
    def init(self, key, policy=DEFAULT_POLICY):
        return {}, {}


class ReLU(_Stateless):
    def __call__(self, params, state, x, ctx):
        return ops.relu(x), state


class ReLU6(_Stateless):
    def __call__(self, params, state, x, ctx):
        return ops.relu6(x), state


class HardSwish(_Stateless):
    def __call__(self, params, state, x, ctx):
        return jax.nn.hard_swish(x), state


class Sigmoid(_Stateless):
    def __call__(self, params, state, x, ctx):
        return jax.nn.sigmoid(x), state


class Dropout(_Stateless):
    def __init__(self, rate=0.5):
        self.rate = rate

    def __call__(self, params, state, x, ctx: Context):
        if not ctx.train or self.rate == 0.0:
            return x, state
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)), state


class Flatten(_Stateless):
    def __call__(self, params, state, x, ctx):
        if (getattr(ctx, "spatial_axis", None) is not None
                and x.ndim == 4 and x.shape[1] > 0):
            from convnet_tpu.parallel.spatial import flatten_spatial
            return flatten_spatial(x, ctx.spatial_axis), state
        return x.reshape(x.shape[0], -1), state


class SpaceToDepth(_Stateless):
    """(B, H, W, C) → (B, H/b, W/b, b²·C). MXU-friendly stem transform:
    trades spatial for channel depth so the first conv has ≥ b²·C input
    channels instead of 3 (the classic TPU ResNet stem trick)."""

    def __init__(self, block=2):
        self.block = block

    def __call__(self, params, state, x, ctx):
        b = self.block
        n, h, w, c = x.shape
        x = x.reshape(n, h // b, b, w // b, b, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h // b, w // b, b * b * c), state


class MaxPool2d(_Stateless):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding

    def __call__(self, params, state, x, ctx):
        if ctx.spatial_axis is not None:
            from convnet_tpu.parallel.spatial import max_pool2d_spatial
            return max_pool2d_spatial(x, self.kernel_size, self.stride,
                                      self.padding,
                                      axis_name=ctx.spatial_axis), state
        return ops.max_pool2d(x, self.kernel_size, self.stride, self.padding,
                              impl=ctx.impl), state


class AvgPool2d(_Stateless):
    """``count_include_pad`` mirrors torch.nn.AvgPool2d: True divides
    every window by kernel area (torchvision Inception-v3 semantics);
    False divides by the number of in-bounds taps (canonical
    Cadene/timm Inception-v4 / Inception-ResNet-v2 branch pools)."""

    def __init__(self, kernel_size, stride=None, padding=0,
                 count_include_pad=True):
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding
        self.count_include_pad = count_include_pad

    def __call__(self, params, state, x, ctx):
        if getattr(ctx, "spatial_axis", None) is not None:
            from convnet_tpu.parallel.spatial import avg_pool2d_spatial
            return avg_pool2d_spatial(
                x, self.kernel_size, self.stride, self.padding,
                axis_name=ctx.spatial_axis,
                count_include_pad=self.count_include_pad), state
        return ops.avg_pool2d(x, self.kernel_size, self.stride, self.padding,
                              count_include_pad=self.count_include_pad), state


class GlobalAvgPool(_Stateless):
    """AdaptiveAvgPool2d(1) + flatten equivalent."""

    def __init__(self, keepdims=False):
        self.keepdims = keepdims

    def __call__(self, params, state, x, ctx):
        if getattr(ctx, "spatial_axis", None) is not None:
            from convnet_tpu.parallel.spatial import global_avg_pool_spatial
            return global_avg_pool_spatial(
                x, ctx.spatial_axis, keepdims=self.keepdims), state
        return ops.global_avg_pool(x, keepdims=self.keepdims), state


class LocalResponseNorm(_Stateless):
    """LRN across channels (AlexNet-era; kept for zoo completeness)."""

    def __init__(self, size=5, alpha=1e-4, beta=0.75, k=2.0):
        self.size, self.alpha, self.beta, self.k = size, alpha, beta, k

    def __call__(self, params, state, x, ctx):
        sq = jnp.square(x.astype(jnp.float32))
        half = self.size // 2
        pads = [(0, 0)] * 3 + [(half, self.size - 1 - half)]
        sq = jnp.pad(sq, pads)
        win = sum(sq[..., i:i + x.shape[-1]] for i in range(self.size))
        denom = jnp.power(self.k + self.alpha * win / self.size, self.beta)
        return (x.astype(jnp.float32) / denom).astype(x.dtype), state
