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
    from convnet_tpu import ops
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    a = ops.max_pool2d(x, 3, 2, 1, impl="xla")
    b = ops.max_pool2d(x, 3, 2, 1, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


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
