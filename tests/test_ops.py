"""Kernel-level parity vs torch.nn.functional over shape/stride/group
sweeps, incl. depthwise (SURVEY.md §4 'Kernel parity'). NCHW↔NHWC
adapters live only here at the parity boundary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from convnet_tpu import ops


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


def hwio(w_oihw):
    return np.ascontiguousarray(np.transpose(w_oihw, (2, 3, 1, 0)))


@pytest.mark.parametrize("cin,cout,k,stride,pad,groups", [
    (3, 16, 3, 1, 1, 1),
    (8, 16, 1, 1, 0, 1),
    (16, 32, 3, 2, 1, 1),
    (16, 16, 3, 1, 1, 16),     # depthwise
    (16, 32, 3, 1, 1, 4),      # grouped
    (3, 8, 7, 2, 3, 1),        # stem-style
    (4, 8, 5, 1, 2, 1),
])
def test_conv2d_parity(cin, cout, k, stride, pad, groups):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, cin, 12, 12)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k, k)).astype(np.float32)
    ours = ops.conv2d(jnp.asarray(nhwc(x)), jnp.asarray(hwio(w)),
                      stride=stride, padding=pad, groups=groups)
    theirs = F.conv2d(torch.tensor(x), torch.tensor(w), stride=stride,
                      padding=pad, groups=groups).numpy()
    np.testing.assert_allclose(nchw(np.asarray(ours)), theirs,
                               rtol=1e-4, atol=1e-4)


def test_conv2d_grad_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)

    def loss_jax(x_, w_):
        y = ops.conv2d(x_, w_, stride=1, padding=1)
        return jnp.sum(jnp.square(y))

    gx, gw = jax.grad(loss_jax, argnums=(0, 1))(
        jnp.asarray(nhwc(x)), jnp.asarray(hwio(w)))

    xt = torch.tensor(x, requires_grad=True)
    wt = torch.tensor(w, requires_grad=True)
    F.conv2d(xt, wt, padding=1).pow(2).sum().backward()
    np.testing.assert_allclose(nchw(np.asarray(gx)), xt.grad.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gw), (3, 2, 0, 1)), wt.grad.numpy(),
        rtol=1e-3, atol=1e-3)


def test_batch_norm_train_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 8, 6, 6)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    r_mean = np.zeros(8, np.float32)
    r_var = np.ones(8, np.float32)

    y, new_mean, new_var = ops.batch_norm_train(
        jnp.asarray(nhwc(x)), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(r_mean), jnp.asarray(r_var), momentum=0.1)

    xt = torch.tensor(x)
    rm = torch.tensor(r_mean.copy())
    rv = torch.tensor(r_var.copy())
    yt = F.batch_norm(xt, rm, rv, torch.tensor(scale), torch.tensor(bias),
                      training=True, momentum=0.1)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(),
                               rtol=1e-4, atol=1e-4)
    # running-stat semantics (unbiased var in EMA) match torch
    np.testing.assert_allclose(np.asarray(new_mean), rm.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var), rv.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_parity():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 8, 6, 6)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    r_mean = rng.standard_normal(8).astype(np.float32)
    r_var = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5

    y = ops.batch_norm_inference(
        jnp.asarray(nhwc(x)), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(r_mean), jnp.asarray(r_var))
    yt = F.batch_norm(torch.tensor(x), torch.tensor(r_mean),
                      torch.tensor(r_var), torch.tensor(scale),
                      torch.tensor(bias), training=False)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_max_pool_parity(k, stride, pad):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 9, 9)).astype(np.float32)
    ours = ops.max_pool2d(jnp.asarray(nhwc(x)), k, stride, pad)
    theirs = F.max_pool2d(torch.tensor(x), k, stride, pad).numpy()
    np.testing.assert_allclose(nchw(np.asarray(ours)), theirs,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k,stride,pad", [(2, 2, 0), (3, 2, 1)])
def test_avg_pool_parity(k, stride, pad):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    ours = ops.avg_pool2d(jnp.asarray(nhwc(x)), k, stride, pad)
    theirs = F.avg_pool2d(torch.tensor(x), k, stride, pad).numpy()
    np.testing.assert_allclose(nchw(np.asarray(ours)), theirs,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride,pad,icp", [
    (2, 2, 0, True), (3, 2, 1, True), (3, 1, 1, True), (3, 2, 1, False),
    (3, 1, 1, False), (2, 1, 0, True), (5, 3, 2, True)])
@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])
def test_avg_pool_grad(k, stride, pad, icp, hw):
    """Custom pad-sum avg-pool VJP vs torch, incl. count_include_pad
    variants and odd sizes (residue classes with missing taps)."""
    rng = np.random.default_rng(9)
    h, w = hw
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    g = jax.grad(lambda x_: jnp.sum(ops.avg_pool2d(
        x_, k, stride, pad, count_include_pad=icp) ** 2))(
            jnp.asarray(nhwc(x)))
    xt = torch.tensor(x, requires_grad=True)
    y = F.avg_pool2d(xt, k, stride, pad, count_include_pad=icp)
    (y ** 2).sum().backward()
    np.testing.assert_allclose(nchw(np.asarray(g)), xt.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_max_pool_grad():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)

    g = jax.grad(lambda x_: jnp.sum(ops.max_pool2d(x_, 3, 2, 1)))(
        jnp.asarray(nhwc(x)))
    xt = torch.tensor(x, requires_grad=True)
    F.max_pool2d(xt, 3, 2, 1).sum().backward()
    np.testing.assert_allclose(nchw(np.asarray(g)), xt.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride,pad", [
    (2, 2, 0), (3, 2, 1), (3, 1, 1), (3, 3, 1), (2, 1, 0), (5, 3, 2),
    (3, 2, 0)])
@pytest.mark.parametrize("hw", [(9, 9), (8, 12), (7, 7)])
def test_max_pool_bwd_formulations_exact(k, stride, pad, hw):
    """The pad-sum backward (default) and the interleave backward are
    bit-exact vs each other and vs torch's routing, over irregular
    sizes and configs (odd/even residue classes, taps out of range)."""
    from convnet_tpu.ops import pool as pm
    rng = np.random.default_rng(11)
    h, w = hw
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    xj = jnp.asarray(nhwc(x))

    def run(bwd):
        mpfn = pm._make_max_pool.__wrapped__((k, k), (stride, stride),
                                             (pad, pad), xj.shape,
                                             "float32")
        # rebuild with the chosen backward by monkeypatching selection
        return jax.grad(lambda x_: jnp.sum(mpfn(x_) ** 2))(xj)

    old = pm._select_mp_bwd
    try:
        pm._select_mp_bwd = lambda *a: pm._mp_bwd_padsum
        g_pad = np.asarray(run(pm._mp_bwd_padsum))
        pm._select_mp_bwd = lambda *a: pm._mp_bwd_interleave
        g_int = np.asarray(run(pm._mp_bwd_interleave))
    finally:
        pm._select_mp_bwd = old
    # contributions are identical term-sets; only the add order differs
    # between formulations (visible at 1e-7 when k > stride)
    np.testing.assert_allclose(g_pad, g_int, rtol=1e-6, atol=1e-6)

    xt = torch.tensor(x, requires_grad=True)
    y = F.max_pool2d(xt, k, stride, pad)
    (y ** 2).sum().backward()
    np.testing.assert_allclose(nchw(g_pad), xt.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride,pad", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_separable_max_pool_matches_legacy(k, stride, pad):
    """The gated separable variant (CONVNET_TPU_SEPARABLE_POOL=1) stays
    exact vs the default 2-D path, fwd and bwd."""
    from convnet_tpu.ops import pool as pm
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 4)).astype(np.float32))
    leg = pm._make_max_pool((k, k), (stride, stride), (pad, pad),
                            x.shape, "float32")
    sep = pm._make_max_pool_separable((k, k), (stride, stride), (pad, pad),
                                      x.shape, "float32")
    np.testing.assert_allclose(np.asarray(leg(x)), np.asarray(sep(x)))
    g1 = jax.grad(lambda x_: jnp.sum(leg(x_) ** 2))(x)
    g2 = jax.grad(lambda x_: jnp.sum(sep(x_) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_global_avg_pool():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    ours = ops.global_avg_pool(jnp.asarray(nhwc(x)))
    theirs = torch.tensor(x).mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_small_pool_conv_chain_finite_and_exact():
    """Axon-backend erratum regression (ops/pool.py _erratum_class):
    conv7x7/2 -> maxpool3/2/1 -> conv3x3 in ONE jit produced structured
    NaNs on the axon TPU backend when the strided-slice pool forward is
    fused between convs. Strided+padded pools now lower the primal via
    reduce_window; on CPU this asserts exactness of that path vs torch,
    on a TPU backend it also exercises the previously-miscompiling
    fusion context itself."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    w7 = (rng.standard_normal((7, 7, 3, 16)) * 0.05).astype(np.float32)
    w3 = (rng.standard_normal((3, 3, 16, 24)) * 0.05).astype(np.float32)

    @jax.jit
    def chain(x, w7, w3):
        h = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = ops.max_pool2d(h, 3, 2, 1)
        return jax.lax.conv_general_dilated(
            h, w3, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = np.asarray(chain(jnp.asarray(x), jnp.asarray(w7), jnp.asarray(w3)))
    assert np.isfinite(out).all()

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    ht = F.conv2d(xt, torch.tensor(np.transpose(w7, (3, 2, 0, 1))),
                  stride=2, padding=3)
    ht = F.max_pool2d(ht, 3, 2, 1)
    yt = F.conv2d(ht, torch.tensor(np.transpose(w3, (3, 2, 0, 1))),
                  stride=1, padding=1).numpy()
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), yt,
                               rtol=1e-4, atol=1e-4)


def test_pool_env_flags_take_effect_after_first_build(monkeypatch):
    """CONVNET_TPU_POOL_BWD / POOL_SAFE participate in the pool
    factory cache key (ADVICE round 2): flipping the env var after a
    config has been built must switch formulations in-process."""
    import os
    from convnet_tpu.ops import pool as P

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 9, 9, 8)), jnp.float32)

    def gsum(x_):
        return jnp.sum(P.max_pool2d(x_, 3, 2, 1) ** 2)

    monkeypatch.delenv("CONVNET_TPU_POOL_BWD", raising=False)
    g_default = jax.grad(gsum)(x)
    monkeypatch.setenv("CONVNET_TPU_POOL_BWD", "interleave")
    g_interleave = jax.grad(gsum)(x)
    # same gradients, but produced by DIFFERENT cached builds
    np.testing.assert_allclose(np.asarray(g_default),
                               np.asarray(g_interleave), rtol=1e-6)
    # the cache must hold two distinct entries for the two flag values
    assert P._make_max_pool.cache_info().currsize >= 2


@pytest.mark.parametrize("cin,g,h,stride", [
    (128, 32, 10, 1),     # T=1 (the job-105 dense-masked case)
    (256, 32, 10, 1),     # T=2, cg=8
    (256, 32, 11, 2),     # stride-2 downsample block
    (512, 32, 8, 1),      # T=4, cg=16
])
def test_grouped_tiled_matches_fgc(monkeypatch, cin, g, h, stride):
    """The tiled-dense grouped lowering (VERDICT r4 #2; jobs 103/105/134)
    must match feature_group_count exactly — forward, dx, AND dw (the
    eye-mask chain rule must kill off-block wgrads)."""
    from convnet_tpu.ops import conv as C

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, cin // g, cin)) * 0.1, jnp.float32)

    def loss(x_, w_):
        y = ops.conv2d(x_, w_, stride=stride, padding=1, groups=g)
        return jnp.sum(y ** 2), y

    def run(mode):
        monkeypatch.setattr(C, "_GROUPED_MODE", mode)
        (l, y), (dx, dw) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(x, w)
        return y, dx, dw

    y_f, dx_f, dw_f = run("fgc")
    y_t, dx_t, dw_t = run("tiled")
    assert C._tiled_grouped_eligible(x.shape, w.shape, g, 1)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_t), np.asarray(dx_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_t), np.asarray(dw_f),
                               rtol=1e-4, atol=1e-4)


def test_grouped_tiled_ineligible_shapes():
    """Depthwise, dense, non-128-multiple C, and cin!=cout must stay on
    the fgc path."""
    from convnet_tpu.ops import conv as C

    assert not C._tiled_grouped_eligible((2, 8, 8, 16), (3, 3, 1, 16), 16, 1)
    assert not C._tiled_grouped_eligible((2, 8, 8, 16), (3, 3, 16, 16), 1, 1)
    assert not C._tiled_grouped_eligible((2, 8, 8, 96), (3, 3, 3, 96), 32, 1)
    assert not C._tiled_grouped_eligible((2, 8, 8, 128), (3, 3, 4, 256), 32, 1)
    # dilation blocks the reformulation
    assert not C._tiled_grouped_eligible((2, 8, 8, 128), (3, 3, 4, 128), 32, 2)
