"""Post-training int8 quantization for the serving path.

Beyond-reference serving capability (the reference's deployment
story stops at ``--evaluate`` + absorb_bn, main.py:~280 approx.,
SURVEY.md §3.2). The v5e MXU runs int8 at 2x the bf16 rate and
pre-quantized int8 dots measure 1.06-2.16x bf16 at RN50's pointwise
shapes (scripts/jobs/done/061/062) — but **model-level int8 serving
measured 0.16-0.29x on this backend** (jobs 063/064): the bf16 model
is HBM-bound inside XLA's conv+BN+ReLU+residual mega-fusions
(~90% of bandwidth speed-of-light, PERF_NOTES jobs 010-013), and
routing pointwise convs to int8 dots breaks those fusion boundaries
while the quantize passes *add* a read+write of every activation.
The MXU rate advantage cannot help a bandwidth-bound model.

The subsystem therefore ships **opt-in** (``Predictor(quantize=
"int8")``), accuracy-tested (tests/test_quant.py: corr > 0.9999,
top-1 agreement 1.00 on-chip at RN50/MobileNet scale) — the same
policy as the measured-slower Pallas kernels: a correct, tested
formulation for backends/regimes where the trade-off flips (weight-
bound models, future backends whose int8 path fuses epilogues).
Selectivity by measurement: only stride-1 dense pad-0 1x1 convs on
real spatial maps are ever quantized; 3x3 convs (0.65x), the fc head
(0.91x) and stride-2 projections always stay bf16.

Scheme: symmetric per-output-channel weight scales (computed from the
weights at trace time — exact, no calibration needed) and symmetric
per-tensor **static** activation scales from a calibration pass.
Static activation scales matter on TPU: the x -> int8 quantize is a
pure elementwise op XLA fuses into the *producing* op's epilogue, so
the int8 activation is written directly (half the bytes); a dynamic
per-batch amax would force materializing the bf16 tensor first and
re-reading it, eating the bandwidth saving.

Wiring: ``Context.quant`` carries a :class:`QuantCtx`. In
``"calibrate"`` mode every eligible conv records its input amax and
computes the normal bf16 forward (standard PTQ: ranges are observed
on the float model). In ``"int8"`` mode each eligible conv consumes
the next recorded scale **in traversal order** — the traversal is
deterministic (core/module.py: definition order), so calibration and
inference pair up without named paths. ``serve.Predictor(quantize=
"int8")`` is the user surface.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass
class QuantCtx:
    """Threaded through the forward via ``Context.quant``.

    mode="calibrate": ``scales`` collects per-layer input amax (traced
    or concrete arrays, in traversal order).
    mode="int8": ``scales`` holds the python-float activation scales
    (amax/127) consumed in the same order; they bake into the jitted
    graph as constants. A fresh QuantCtx must be created per trace
    (the cursor is trace-time state).
    """

    mode: str
    scales: List
    cursor: int = 0

    def record(self, amax) -> None:
        self.scales.append(amax)

    def next_scale(self) -> float:
        if self.cursor >= len(self.scales):
            raise ValueError(
                f"QuantCtx: model has more quantizable convs than "
                f"calibrated scales ({len(self.scales)}) — calibrate "
                f"with the same model/config/input size")
        s = self.scales[self.cursor]
        self.cursor += 1
        return s


def conv_eligible(conv, x_shape) -> bool:
    """Stride-1, dense, pad-0 pointwise convs on real spatial maps —
    the set measured to win as int8 dots (module docstring). The
    spatial-size guard keeps 1x1 convs on pooled [B,1,1,C] tensors
    (SE bottlenecks) in bf16, where quantization costs more than the
    dot. MUST be deterministic in (conv config, x shape): calibration
    and int8 inference rely on identical traversal."""
    ks = conv.kernel_size
    stride = conv.stride if isinstance(conv.stride, tuple) else (conv.stride,) * 2
    pad = conv.padding
    if isinstance(pad, (tuple, list)):
        flat = []
        for p in pad:
            flat.extend(p if isinstance(p, (tuple, list)) else [p])
        pad_zero = all(p == 0 for p in flat)
    else:
        pad_zero = pad == 0
    return (tuple(ks) == (1, 1) and conv.groups == 1
            and stride == (1, 1) and pad_zero
            and conv.dilation in (1, (1, 1))
            and x_shape[1] * x_shape[2] >= 16)


def quantize_weight_1x1(w):
    """Per-output-channel symmetric int8 weights for a [1,1,Cin,Cout]
    (or [Cin,Cout]) kernel. Returns (wq int8 [Cin,Cout], sw fp32
    [Cout]). Runs at trace time on the (small) weight — exact ranges,
    nothing to calibrate."""
    wf = w.reshape(w.shape[-2], w.shape[-1]).astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def quantize_act(x, act_scale: float):
    """x -> int8 with a static per-tensor scale, computed in x's own
    dtype (integers ≤ 127 are exact in bf16 — no fp32 upcast pass).
    Returns (xq, eff_scale): ``eff_scale`` is the scale actually
    applied after casting 1/act_scale to x.dtype; dequant must use it
    for exact consistency."""
    inv = np.asarray(1.0 / act_scale, x.dtype)  # host-side constant
    eff_scale = 1.0 / float(inv)
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return xq, eff_scale


def conv1x1_int8(x, w, act_scale: float):
    """int8 pointwise conv: quantize -> int8 dot (int32 accumulation
    on the MXU) -> per-channel dequant to x.dtype."""
    b, h, wd, c = x.shape
    xq, eff_scale = quantize_act(x, act_scale)
    wq, sw = quantize_weight_1x1(w)
    acc = lax.dot(xq.reshape(b * h * wd, c), wq,
                  preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * (jnp.float32(eff_scale) * sw))
    return y.astype(x.dtype).reshape(b, h, wd, -1)


def calibrate(model, params, state, batches, ctx_kwargs: Optional[dict]
              = None) -> List[float]:
    """Run the float model over ``batches`` (iterable of NHWC arrays,
    already normalized like the inference inputs) recording every
    eligible conv's input amax; returns the per-layer activation
    scales (amax/127, max over batches) in traversal order.

    The observation pass runs under jit: ``QuantCtx("calibrate")``
    collects the *traced* amax values during tracing and the wrapper
    returns them as outputs — one compiled forward per batch shape
    instead of an op-by-op eager walk."""
    from convnet_tpu.core.module import Context

    kw = dict(ctx_kwargs or {})

    @jax.jit
    def observe(params, state, x):
        q = QuantCtx("calibrate", [])
        ctx = Context(train=False, quant=q, **kw)
        model(params, state, x, ctx)
        return tuple(q.scales)

    per_batch = [[float(a) for a in observe(params, state, jnp.asarray(x))]
                 for x in batches]
    if not per_batch:
        raise ValueError("calibrate: need at least one batch")
    n = len(per_batch[0])
    if any(len(b) != n for b in per_batch):
        raise ValueError("calibrate: inconsistent quantizable-conv "
                         "count across batches (batch shapes differ?)")
    return [max(1e-8, max(b[i] for b in per_batch)) / 127.0
            for i in range(n)]
