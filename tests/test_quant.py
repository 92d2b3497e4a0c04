"""int8 post-training quantization (nn/quant.py + serve.Predictor).

Beyond-reference serving feature; scheme and measured motivation in
nn/quant.py's docstring (scripts/jobs/done/061/062). These tests pin:
numerical closeness of the int8 pointwise conv, per-channel weight
quantization bounds, eligibility guards, calibration bookkeeping, and
the Predictor-level int8-vs-float logits agreement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convnet_tpu.nn.quant import (QuantCtx, calibrate, conv1x1_int8,
                                  conv_eligible, quantize_weight_1x1)
from convnet_tpu.nn.layers import Conv2d


def test_conv1x1_int8_close_to_fp():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32, 64),
                          jnp.float32) * 0.1
    act_scale = float(jnp.max(jnp.abs(x))) / 127.0
    y8 = conv1x1_int8(x, w, act_scale)
    yf = jnp.einsum("bhwc,cd->bhwd", x, w[0, 0])
    rel = float(jnp.sqrt(jnp.mean((y8 - yf) ** 2))
                / (jnp.sqrt(jnp.mean(yf ** 2)) + 1e-12))
    assert rel < 0.02, rel


def test_quantize_weight_per_channel_bound():
    """Dequantized weights are within half a quantization step of the
    original, per output channel (symmetric round-to-nearest)."""
    w = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16, 8), jnp.float32)
    wq, sw = quantize_weight_1x1(w)
    wrec = np.asarray(wq, np.float32) * np.asarray(sw)
    err = np.abs(wrec - np.asarray(w).reshape(16, 8))
    assert (err <= np.asarray(sw) / 2 + 1e-7).all()
    assert np.asarray(wq).dtype == np.int8


def test_eligibility_guards():
    ok = Conv2d(64, 128, 1)
    assert conv_eligible(ok, (4, 14, 14, 64))
    # pooled [B,1,1,C] tensors (SE bottlenecks) stay float
    assert not conv_eligible(ok, (4, 1, 1, 64))
    assert not conv_eligible(Conv2d(64, 128, 3, padding=1), (4, 14, 14, 64))
    assert not conv_eligible(Conv2d(64, 128, 1, stride=2), (4, 14, 14, 64))
    assert not conv_eligible(Conv2d(64, 64, 1, groups=64), (4, 14, 14, 64))


def test_quantctx_exhaustion_raises():
    q = QuantCtx("int8", [0.1])
    q.next_scale()
    with pytest.raises(ValueError, match="more quantizable"):
        q.next_scale()


def test_calibrate_counts_and_determinism():
    from convnet_tpu import models
    model = models.build("mobilenet")
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    s1 = calibrate(model, params, state, [x])
    s2 = calibrate(model, params, state, [x])
    # MobileNet v1: every pointwise conv is stride-1 1x1 -> eligible
    assert len(s1) > 5
    assert s1 == s2
    assert all(s > 0 for s in s1)


def test_predictor_int8_matches_float():
    """End to end: Predictor(quantize='int8') tracks the float
    Predictor on the same (seeded, identical) random-init MobileNet —
    logits highly correlated, top-1 mostly preserved."""
    from convnet_tpu.serve import Predictor
    kw = dict(model_config={}, dtype="fp32", batch_size=8, input_size=64)
    base = Predictor("mobilenet", **kw)
    quant = Predictor("mobilenet", quantize="int8", **kw)
    assert quant.act_scales is not None and len(quant.act_scales) > 5
    x = np.random.default_rng(1).integers(0, 256, (8, 64, 64, 3), np.uint8)
    lb = base.predict_logits(x)
    lq = quant.predict_logits(x)
    corr = np.corrcoef(lb.ravel(), lq.ravel())[0, 1]
    assert corr > 0.99, corr
    agree = float(np.mean(lb.argmax(-1) == lq.argmax(-1)))
    assert agree >= 0.75, agree
