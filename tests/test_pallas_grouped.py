"""Pallas grouped-conv parity (interpret mode on CPU; compiled-path
parity + timing on TPU: jobs 137/140). Reference semantics: torch
grouped Conv2d (ResNeXt's width/groups knobs, SURVEY.md §2.2
models/resnet.py row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from convnet_tpu.ops.pallas import grouped as G


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


@pytest.mark.parametrize("cin,g,h,stride", [
    (128, 32, 8, 1),    # T=1, cg=4 (ResNeXt stage-1 pattern)
    (256, 32, 7, 1),    # T=2, cg=8
    (256, 32, 9, 2),    # stride-2 downsample (XLA-fallback bwd path)
    (128, 16, 8, 1),    # cg=8 in one tile
])
def test_pallas_grouped_parity(cin, g, h, stride):
    """fwd, dx, dw must all match torch's grouped conv."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, h, h, cin)).astype(np.float32)
    # HWIO grouped weight: (kh, kw, cin/g, cout)
    w = (rng.standard_normal((3, 3, cin // g, cin)) * 0.1).astype(np.float32)

    assert G.supported(x.shape, w.shape, g, stride)

    def loss(x_, w_):
        y = G.grouped_conv_pallas(x_, w_, stride=stride, padding=1,
                                  groups=g, interpret=True)
        return jnp.sum(y ** 2), y

    (l, y), (dx, dw) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(x), jnp.asarray(w))

    xt = torch.tensor(nchw(x), requires_grad=True)
    # HWIO -> torch OIHW with grouped layout: (cout, cin/g, kh, kw)
    wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)), requires_grad=True)
    yt = F.conv2d(xt, wt, stride=stride, padding=1, groups=g)
    (yt ** 2).sum().backward()

    np.testing.assert_allclose(nchw(np.asarray(y)), yt.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(nchw(np.asarray(dx)), xt.grad.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(dw), (3, 2, 0, 1)), wt.grad.numpy(),
        rtol=1e-3, atol=1e-3)


def test_pallas_grouped_supported_gate():
    """Structural eligibility must reject depthwise, dense, ragged-C,
    cin!=cout, stride>2, and dilation."""
    ok = G.supported((2, 8, 8, 128), (3, 3, 4, 128), 32, 1)
    assert ok
    assert not G.supported((2, 8, 8, 16), (3, 3, 1, 16), 16, 1)     # dw
    assert not G.supported((2, 8, 8, 128), (3, 3, 128, 128), 1, 1)  # dense
    assert not G.supported((2, 8, 8, 96), (3, 3, 3, 96), 32, 1)     # C%128
    assert not G.supported((2, 8, 8, 128), (3, 3, 4, 256), 32, 1)   # cout
    assert not G.supported((2, 8, 8, 128), (3, 3, 4, 128), 32, 4)   # stride
    assert not G.supported((2, 8, 8, 128), (3, 3, 4, 128), 32, 1, 2)


def test_conv2d_layer_eval_pallas_route():
    """`--impl pallas` eval traces must route the stage-1 ResNeXt shape
    through the Pallas kernel with unchanged numerics, and must NOT
    reroute training traces (job 140: fwd-only win, fwd+bwd loss)."""
    from convnet_tpu.core.module import Context
    from convnet_tpu.nn.layers import Conv2d

    conv = Conv2d(128, 128, 3, stride=1, padding=1, groups=32)
    params, state = conv.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 56, 56, 128)),
        jnp.float32)

    ctx_eval = Context(train=False, impl="pallas")
    ctx_train = Context(train=True, impl="pallas",
                        rng=jax.random.PRNGKey(1))
    assert conv._pallas_grouped_ok(ctx_eval, x.shape)
    assert not conv._pallas_grouped_ok(ctx_train, x.shape)
    # other shapes stay on XLA even at eval
    assert not conv._pallas_grouped_ok(ctx_eval, (1, 28, 28, 128))
    assert not conv._pallas_grouped_ok(ctx_eval, (1, 56, 56, 256))

    y_pal, _ = conv(params, state, x, ctx_eval)
    y_xla, _ = conv(params, state, x, Context(train=False, impl="xla"))
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=1e-4, atol=1e-4)
