"""Parity tests for the fused inverted-residual Pallas kernel
(ops/pallas/mbconv.py) against the unfused composition the model zoo
runs (conv → BN → ReLU6 → depthwise → BN → ReLU6 → conv → BN
[+residual]) — SURVEY.md §4 'Kernel parity'. Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu.ops.pallas import mbconv


def _ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, residual,
               act_mid="relu6", act_out="none"):
    v = x.astype(jnp.float32)
    ch = wd.shape[-1]
    if we is not None:
        v = mbconv._act(jnp.einsum("bhwc,cd->bhwd", v,
                                   we.astype(jnp.float32)) * s1 + t1,
                        act_mid)
    h2 = jax.lax.conv_general_dilated(
        v, wd.reshape(3, 3, 1, ch).astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), feature_group_count=ch,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    u2 = mbconv._act(h2 * s2 + t2, act_mid)
    y = jnp.einsum("bhwc,cd->bhwd", u2, wpj.astype(jnp.float32))
    y = y * s3 + t3
    if residual:
        y = y + x.astype(jnp.float32)
    return mbconv._act(y, act_out)


def _mk(key, b=2, h=8, w=8, cin=8, ch=24, cout=8, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, h, w, cin), dtype)
    we = jax.random.normal(ks[1], (cin, ch), dtype) * 0.3
    wd = jax.random.normal(ks[2], (3, 3, 1, ch), dtype) * 0.3
    wpj = jax.random.normal(ks[3], (ch, cout), dtype) * 0.3
    vecs = [jax.random.normal(ks[4 + i], (ch,), jnp.float32) * 0.2 + 1.0
            for i in range(4)]
    v3 = [jax.random.normal(ks[8 + i], (cout,), jnp.float32) * 0.2 + 0.5
          for i in range(2)]
    return x, we, wd, wpj, vecs, v3


@pytest.mark.parametrize("residual", [True, False])
def test_infer_parity_expand(residual):
    x, we, wd, wpj, (s1, t1, s2, t2), (s3, t3) = _mk(jax.random.PRNGKey(0))
    got = mbconv.mbconv_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3,
                              residual=residual, interpret=True)
    want = _ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_infer_parity_no_expand():
    """MobileNet-v1-style pair: depthwise straight on the input, relu
    after the project conv, no residual."""
    x, _, wd, wpj, (_, _, s2, t2), (s3, t3) = _mk(
        jax.random.PRNGKey(1), cin=24, ch=24, cout=16)
    got = mbconv.mbconv_infer(x, None, None, None, wd, s2, t2, wpj, s3,
                              t3, residual=False, act_out="relu",
                              interpret=True)
    want = _ref_infer(x, None, None, None, wd, s2, t2, wpj, s3, t3,
                      False, act_out="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_infer_nonsquare_and_chunked():
    """H that forces multiple row chunks + W != H."""
    x, we, wd, wpj, (s1, t1, s2, t2), (s3, t3) = _mk(
        jax.random.PRNGKey(2), b=1, h=12, w=6, cin=8, ch=16, cout=8)
    # chunk_of(12, 28) = 12 → force chunking via h=56? keep cheap: h=12
    got = mbconv.mbconv_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3,
                              residual=True, interpret=True)
    want = _ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_infer_multi_chunk_rows():
    """H=56 → chunk 28, two chunks: exercises the neighbor-fetch halo
    across a real chunk boundary and the clamped edges."""
    x, we, wd, wpj, (s1, t1, s2, t2), (s3, t3) = _mk(
        jax.random.PRNGKey(3), b=1, h=56, w=4, cin=8, ch=8, cout=8)
    got = mbconv.mbconv_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3,
                              residual=True, interpret=True)
    want = _ref_infer(x, we, s1, t1, wd, s2, t2, wpj, s3, t3, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _bn_moments(v):
    v32 = np.asarray(v, np.float32)
    mean = v32.reshape(-1, v32.shape[-1]).mean(0)
    var = (v32 * v32).reshape(-1, v32.shape[-1]).mean(0) - mean * mean
    return mean, np.maximum(var, 0)


def test_train_forward_parity_and_stats():
    x, we, wd, wpj, (g1, b1, g2, b2), (g3, b3) = _mk(jax.random.PRNGKey(4))
    out, (st1, st2, st3) = mbconv.mbconv_train_forward(
        x, we, g1, b1, wd, g2, b2, wpj, g3, b3, residual=True,
        interpret=True)
    want = mbconv._unfused(x, we, g1, b1, wd, g2, b2, wpj, g3, b3,
                           eps=1e-5, residual=True, act_mid="relu6",
                           act_out="none", axis_name=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    # stats match the materialized intermediates
    h1 = jnp.einsum("bhwc,cd->bhwd", x, we)
    m1, v1 = _bn_moments(h1)
    np.testing.assert_allclose(np.asarray(st1[0]), m1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st1[1]), v1, rtol=1e-3, atol=1e-5)
    assert st2[0].shape == (wd.shape[-1],)
    assert st3[0].shape == (wpj.shape[-1],)


def test_train_forward_no_expand():
    x, _, wd, wpj, (_, _, g2, b2), (g3, b3) = _mk(
        jax.random.PRNGKey(5), cin=16, ch=16, cout=16)
    out, (st1, st2, st3) = mbconv.mbconv_train_forward(
        x, None, None, None, wd, g2, b2, wpj, g3, b3, residual=True,
        interpret=True)
    want = mbconv._unfused(x, None, None, None, wd, g2, b2, wpj, g3, b3,
                           eps=1e-5, residual=True, act_mid="relu6",
                           act_out="none", axis_name=None)
    assert st1 is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_train_gradients_match_unfused():
    """mbconv_train's custom VJP must produce the unfused composition's
    gradients exactly (it recomputes through it)."""
    x, we, wd, wpj, (g1, b1, g2, b2), (g3, b3) = _mk(
        jax.random.PRNGKey(6), b=1, h=6, w=6, cin=8, ch=16, cout=8)

    def loss_fused(*a):
        out, _ = mbconv.mbconv_train(*a, residual=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out = mbconv._unfused(a[0], *a[1:], eps=1e-5, residual=True,
                              act_mid="relu6", act_out="none",
                              axis_name=None)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x, we, g1, b1, wd, g2, b2, wpj, g3, b3)
    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_model_eval_fused_path_matches_xla():
    """CONVNET_TPU_FUSED_MBCONV=1 routes eligible MobileNet-V2 blocks
    (stride 1, 256<=hidden<=640) through the fused kernel in eval mode;
    whole-model logits must match the XLA path."""
    import os

    from convnet_tpu import models
    from convnet_tpu.core.module import apply_module

    model = models.build("mobilenet_v2", width=1.0)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    # perturb running stats away from init so BN folding is non-trivial
    state = jax.tree_util.tree_map(
        lambda v: v + 0.05 if v.ndim == 1 else v, state)
    ref, _ = apply_module(model, params, state, x, train=False)
    os.environ["CONVNET_TPU_FUSED_MBCONV"] = "1"
    try:
        got, _ = apply_module(model, params, state, x, train=False)
    finally:
        del os.environ["CONVNET_TPU_FUSED_MBCONV"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
