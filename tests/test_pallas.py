"""Pallas kernel parity tests (interpret mode on CPU — compiled-path
parity is exercised on TPU by bench/validation runs; SURVEY.md §4
'Kernel parity')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from convnet_tpu.ops.pallas.pool import max_pool2d_pallas


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


@pytest.mark.parametrize("k,s,p,shape", [
    (3, 2, 1, (2, 12, 12, 128)),   # resnet stem pattern
    (3, 2, 1, (2, 112, 112, 64)),  # full-size stem
    (2, 2, 0, (2, 8, 8, 32)),      # vgg pattern
    (3, 2, 0, (3, 13, 13, 96)),    # alexnet pattern
    (3, 1, 1, (2, 8, 8, 64)),      # googlenet b4 pattern
])
def test_pallas_maxpool_parity(k, s, p, shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    out = max_pool2d_pallas(jnp.asarray(x), k, s, p, interpret=True)
    ref = F.max_pool2d(torch.tensor(nchw(x)), k, s, p).numpy()
    np.testing.assert_allclose(nchw(np.asarray(out)), ref, rtol=1e-6)

    g = jax.grad(lambda x_: jnp.sum(
        max_pool2d_pallas(x_, k, s, p, interpret=True)))(jnp.asarray(x))
    xt = torch.tensor(nchw(x), requires_grad=True)
    F.max_pool2d(xt, k, s, p).sum().backward()
    np.testing.assert_allclose(nchw(np.asarray(g)), xt.grad.numpy(),
                               rtol=1e-5)


def test_pallas_impl_routing():
    """ops.max_pool2d(impl='pallas') returns the same values as the XLA
    path (on CPU the pallas path runs in interpret mode)."""
    import os
    os.environ["CONVNET_TPU_PALLAS_POOL"] = "1"
    from convnet_tpu import ops
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    a = ops.max_pool2d(x, 3, 2, 1, impl="xla")
    b = ops.max_pool2d(x, 3, 2, 1, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    os.environ.pop("CONVNET_TPU_PALLAS_POOL", None)


def test_pallas_bf16():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 64)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    out = max_pool2d_pallas(xb, 3, 2, 1, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = F.max_pool2d(torch.tensor(nchw(np.asarray(xb, np.float32))),
                       3, 2, 1).numpy()
    np.testing.assert_allclose(nchw(np.asarray(out, np.float32)), ref,
                               rtol=1e-2, atol=1e-2)


def test_fused_matmul_parity():
    from convnet_tpu.ops.pallas.matmul_fused import matmul_scale_act
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((100, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    out = matmul_scale_act(x, w, scale, shift, act="relu", interpret=True)
    ref = np.maximum(np.asarray(x) @ np.asarray(w) * np.asarray(scale)
                     + np.asarray(shift), 0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_fused_convbn_eval_path_matches_xla():
    """ConvBN 1x1 inference: impl='pallas' (fused MXU kernel) equals the
    XLA conv→BN→ReLU chain."""
    import os
    os.environ["CONVNET_TPU_PALLAS_FUSED"] = "1"
    from convnet_tpu.models.resnet import ConvBN
    from convnet_tpu.core.module import Context
    blk = ConvBN(32, 48, 1)
    params, state = blk.init(jax.random.PRNGKey(0))
    # non-trivial BN stats
    state = {"bn": {"mean": jnp.linspace(-1, 1, 48),
                    "var": jnp.linspace(0.5, 2.0, 48)}}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    y_xla, _ = blk(params, state, x, Context(train=False, impl="xla"))
    y_pal, _ = blk(params, state, x, Context(train=False, impl="pallas"))
    os.environ.pop("CONVNET_TPU_PALLAS_FUSED", None)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_mobilenetv2_eval():
    import os
    os.environ["CONVNET_TPU_PALLAS_FUSED"] = "1"
    from convnet_tpu import models
    from convnet_tpu.core.module import Context
    m = models.build("mobilenet_v2", width=0.25)
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y_xla, _ = m(params, state, x, Context(train=False, impl="xla"))
    y_pal, _ = m(params, state, x, Context(train=False, impl="pallas"))
    os.environ.pop("CONVNET_TPU_PALLAS_FUSED", None)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("stride,pad,shape", [
    (1, 1, (2, 14, 14, 128)),
    (2, 1, (2, 14, 14, 64)),
])
def test_pallas_depthwise_parity(stride, pad, shape):
    from convnet_tpu.ops.pallas.depthwise import depthwise_conv_pallas
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    c = shape[-1]
    w = rng.standard_normal((3, 3, 1, c)).astype(np.float32)
    out = depthwise_conv_pallas(jnp.asarray(x), jnp.asarray(w), stride, pad,
                                interpret=True)
    ref = F.conv2d(torch.tensor(nchw(x)),
                   torch.tensor(np.transpose(w, (3, 2, 0, 1))),
                   stride=stride, padding=pad, groups=c).numpy()
    np.testing.assert_allclose(nchw(np.asarray(out)), ref, rtol=1e-4,
                               atol=1e-4)

    # gradients
    def loss_jax(x_, w_):
        return jnp.sum(jnp.square(depthwise_conv_pallas(
            x_, w_, stride, pad, interpret=True)))

    gx, gw = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    xt = torch.tensor(nchw(x), requires_grad=True)
    wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)), requires_grad=True)
    F.conv2d(xt, wt, stride=stride, padding=pad, groups=c).pow(2).sum().backward()
    np.testing.assert_allclose(nchw(np.asarray(gx)), xt.grad.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gw), (3, 2, 0, 1)), wt.grad.numpy(),
        rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_pallas_mobilenet_grads_match_xla():
    """MobileNet v1 forward+backward through the pallas depthwise path
    (interpret mode) matches the XLA path. Eval-mode BN: train-mode
    batch statistics on tiny batches amplify 1e-6 kernel differences
    through rsqrt across 13 layers, making train-mode comparison
    ill-conditioned even between two correct implementations (the
    depthwise kernel itself is verified against torch above)."""
    import os
    os.environ["CONVNET_TPU_PALLAS_DEPTHWISE"] = "1"
    from convnet_tpu import models
    from convnet_tpu.core.module import Context
    m = models.build("mobilenet", width=0.25)
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(p, impl):
        ctx = Context(train=False, impl=impl)
        y, _ = m(p, state, x, ctx)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    l_x = float(loss(params, "xla"))
    l_p = float(loss(params, "pallas"))
    assert l_x == pytest.approx(l_p, rel=1e-4)
    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    for (path_a, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0][:50],
            jax.tree_util.tree_flatten_with_path(g_p)[0][:50]):
        denom = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b) / denom,
                                   np.asarray(a) / denom,
                                   rtol=0, atol=5e-3, err_msg=str(path_a))
    os.environ.pop("CONVNET_TPU_PALLAS_DEPTHWISE", None)


@pytest.mark.parametrize("k,s,p,shape", [
    (3, 2, 1, (2, 16, 16, 8)),    # stem-style overlapping
    (3, 2, 1, (2, 15, 15, 8)),    # odd spatial
    (2, 2, 0, (2, 16, 16, 8)),    # VGG non-overlapping
    (3, 1, 1, (2, 14, 14, 8)),    # GoogLeNet branch pool (stride 1)
    (3, 2, 0, (2, 13, 13, 8)),    # AlexNet-style
    (5, 1, 2, (2, 9, 9, 8)),      # inception 5x5
    ((3, 2), (2, 1), (1, 0), (2, 12, 11, 8)),  # asymmetric
])
def test_pallas_pool_bwd_exact_vs_padsum(k, s, p, shape, monkeypatch):
    """Fused VMEM masked-sum backward (ops/pallas/pool_bwd.py) must
    route gradients identically to the pad-sum formulation, including
    first-match tie-breaking (quantized inputs force ties). Measured
    model-level NEUTRAL on v5e (scripts/jobs/done/016) — kept as the
    exact opt-in formulation for backends with weaker fusion."""
    from convnet_tpu.ops import pool as P

    x = jnp.asarray(np.random.default_rng(0).integers(-3, 4, shape),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        np.asarray(P.max_pool2d(x, k, s, p)).shape), jnp.float32)

    def gsum(x_):
        return jnp.sum(P.max_pool2d(x_, k, s, p) * w)

    monkeypatch.delenv("CONVNET_TPU_POOL_BWD", raising=False)
    g_ref = jax.grad(gsum)(x)
    monkeypatch.setenv("CONVNET_TPU_POOL_BWD", "pallas")
    g_pl = jax.grad(gsum)(x)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_pl))
