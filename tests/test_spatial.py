"""Spatial partitioning (H-sharded activations, halo exchange over the
mesh) — the domain's sequence-parallel analog (SURVEY.md §5.7).
Equivalence tests on the fake-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.parallel.mesh import make_mesh
from convnet_tpu.parallel import spatial as sp

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 fake devices")]


def _spatial_mesh(n):
    import numpy as _np
    from jax.sharding import Mesh
    return Mesh(_np.asarray(jax.devices()[:n]), ("spatial",))


def test_halo_exchange():
    mesh = _spatial_mesh(4)
    x = jnp.arange(4 * 8 * 2 * 1, dtype=jnp.float32).reshape(1, 32, 2, 1)

    def f(x):
        return sp.halo_pad_rows(x, "spatial", 1, 1)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                            out_specs=P(None, "spatial"),
                            check_vma=False))(x)
    out = np.asarray(out).reshape(4, 10, 2)  # per-shard (1+8+1) rows
    ref = np.asarray(x).reshape(32, 2)
    for shard in range(4):
        lo = shard * 8
        # interior rows match the global array
        np.testing.assert_array_equal(out[shard, 1:9], ref[lo:lo + 8])
        # halos: previous/next shard rows, zeros at boundaries
        if shard > 0:
            np.testing.assert_array_equal(out[shard, 0], ref[lo - 1])
        else:
            np.testing.assert_array_equal(out[shard, 0], 0)
        if shard < 3:
            np.testing.assert_array_equal(out[shard, 9], ref[lo + 8])
        else:
            np.testing.assert_array_equal(out[shard, 9], 0)


@pytest.mark.parametrize("kernel,stride,pad", [(3, 1, 1), (3, 2, 1),
                                               (1, 1, 0), (7, 2, 3)])
def test_spatial_conv_matches_unsharded(kernel, stride, pad):
    mesh = _spatial_mesh(4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (kernel, kernel, 8, 16)).astype(np.float32))

    from convnet_tpu import ops
    ref = ops.conv2d(x, w, stride=stride, padding=pad)

    def f(x, w):
        return sp.conv2d_spatial(x, w, stride=stride, padding=pad)

    out = jax.jit(shard_map(f, mesh=mesh,
                            in_specs=(P(None, "spatial"), P()),
                            out_specs=P(None, "spatial"),
                            check_vma=False))(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_spatial_maxpool_matches_unsharded():
    mesh = _spatial_mesh(4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    from convnet_tpu import ops
    ref = ops.max_pool2d(x, 3, 2, 1)

    def f(x):
        return sp.max_pool2d_spatial(x, 3, 2, 1)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                            out_specs=P(None, "spatial"),
                            check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5)


def test_spatial_resnet_forward_and_grads_match():
    """ResNet-20 train-mode forward + weight grads under 4-way spatial
    sharding == single device (BN moments pmean over 'spatial',
    grads psum)."""
    mesh = _spatial_mesh(4)
    model = models.build("resnet", dataset="cifar10", depth=20)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))

    def loss_ref(p):
        y, _ = model(p, state, x, Context(train=True,
                                          rng=jax.random.PRNGKey(1)))
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    ref_loss = float(loss_ref(params))
    ref_grads = jax.grad(loss_ref)(params)

    def sharded_loss_and_grads(p, x):
        def inner(p, x):
            def local_loss(p):
                y, _ = model(p, state, x,
                             Context(train=True, rng=jax.random.PRNGKey(1),
                                     spatial_axis="spatial"))
                return jnp.mean(jnp.square(y.astype(jnp.float32)))

            loss, grads = jax.value_and_grad(local_loss)(p)
            # trunk grads are shard-partial (psum); head grads are
            # already full (replicated region) — see spatial_grad_reduce
            grads = sp.spatial_grad_reduce(grads, "spatial")
            return loss, grads

        return shard_map(inner, mesh=mesh,
                         in_specs=(P(), P(None, "spatial")),
                         out_specs=(P(), P()), check_vma=False)(p, x)

    loss, grads = jax.jit(sharded_loss_and_grads)(params, x)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_grads)[0],
            jax.tree_util.tree_flatten_with_path(grads)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))


def test_trainer_2d_mesh_spatial():
    """Trainer with a (data=2 × spatial=4) mesh: one train step and a
    validate run produce the single-device numbers."""
    from convnet_tpu.parallel.mesh import make_mesh_2d
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig

    mesh = make_mesh_2d(spatial=4, num_devices=8)
    model = models.build("resnet", dataset="cifar10", depth=20)

    def run(mesh):
        tr = Trainer(model, OptimRegime(model.regime), 10,
                     TrainerConfig(print_freq=0, sync_bn=True), mesh=mesh,
                     seed=5)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        y = rng.integers(0, 10, (8,)).astype(np.int32)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        bx, by = tr._shard(jnp.asarray(x), jnp.asarray(y))
        p, s, o, m = step(p, s, o, bx, by, hp, jax.random.PRNGKey(9))
        val = tr.validate([(x, y)], p, s)
        return float(m["loss"]), jax.device_get(p), val

    loss_2d, params_2d, val_2d = run(mesh)
    loss_1, params_1, val_1 = run(None)
    assert loss_2d == pytest.approx(loss_1, rel=1e-3)
    assert val_2d["prec1"] == pytest.approx(val_1["prec1"], abs=1e-6)
    assert val_2d["loss"] == pytest.approx(val_1["loss"], rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_spatial_avgpool_matches_unsharded():
    mesh = _spatial_mesh(4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    from convnet_tpu import ops
    ref = ops.avg_pool2d(x, 3, 1, 1)

    def f(x):
        return sp.avg_pool2d_spatial(x, 3, 1, 1)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                            out_specs=P(None, "spatial"),
                            check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kernel,stride,pad", [(3, 1, 1), (3, 2, 1)])
def test_spatial_avgpool_count_exclude_pad_matches_unsharded(
        kernel, stride, pad):
    """count_include_pad=False (the Cadene Inception-v4/-ResNet-v2
    branch-pool semantics): true-edge windows divide by in-bounds tap
    count; shard-boundary windows must NOT be treated as edges. The
    strided case exercises asymmetric up/down halos against the
    arithmetic tap-count mask (parallel/spatial.py)."""
    mesh = _spatial_mesh(4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    from convnet_tpu import ops
    ref = ops.avg_pool2d(x, kernel, stride, pad, count_include_pad=False)

    def f(x):
        return sp.avg_pool2d_spatial(x, kernel, stride, pad,
                                     count_include_pad=False)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                            out_specs=P(None, "spatial"),
                            check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # gradients route halo cotangents back across shards correctly
    g_ref = jax.grad(lambda v: jnp.sum(
        ops.avg_pool2d(v, kernel, stride, pad,
                       count_include_pad=False) ** 2))(x)
    g_sp = jax.jit(shard_map(
        jax.grad(lambda v: jnp.sum(f(v) ** 2)), mesh=mesh,
        in_specs=P(None, "spatial"), out_specs=P(None, "spatial"),
        check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_spatial_flatten_gathers():
    mesh = _spatial_mesh(4)
    x = jnp.arange(2 * 8 * 2 * 3, dtype=jnp.float32).reshape(2, 8, 2, 3)

    def f(x):
        return sp.flatten_spatial(x)

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                            out_specs=P(), check_vma=False))(x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(2, -1))


def test_spatial_se_resnet_grads_match():
    """SE-ResNet under spatial sharding: the SE gradient plumbing
    (pmean-backward gate + grad-scaled squeeze) keeps ALL grads equal
    to single-device after the trunk psum."""
    mesh = _spatial_mesh(4)
    model = models.build("resnet_se", dataset="cifar10", depth=20)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))

    def loss_ref(p):
        y, _ = model(p, state, x, Context(train=True,
                                          rng=jax.random.PRNGKey(1)))
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    ref_loss = float(loss_ref(params))
    ref_grads = jax.grad(loss_ref)(params)

    def inner(p, x):
        def ll(p):
            y, _ = model(p, state, x,
                         Context(train=True, rng=jax.random.PRNGKey(1),
                                 spatial_axis="spatial"))
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(ll)(p)
        return loss, sp.spatial_grad_reduce(grads, "spatial")

    loss, grads = jax.jit(shard_map(
        inner, mesh=mesh, in_specs=(P(), P(None, "spatial")),
        out_specs=(P(), P()), check_vma=False))(params, x)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_grads)[0],
            jax.tree_util.tree_flatten_with_path(grads)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))


@pytest.mark.parametrize("name,cfg,size", [
    ("densenet", {"depth": 121}, 64),
    ("googlenet", {}, 64),
    ("mobilenet_v2", {"width": 0.25}, 64),
])
def test_spatial_forward_parity_other_models(name, cfg, size):
    """Eval-mode forward under 2-way spatial sharding matches unsharded
    for concat-heavy architectures (densenet), multi-branch pools
    (googlenet), and inverted residuals (mobilenet_v2)."""
    mesh = _spatial_mesh(2)
    model = models.build(name, **cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, size, size, 3)).astype(np.float32))
    y_ref, _ = model(params, state, x, Context(train=False))

    def f(x):
        y, _ = model(params, state, x,
                     Context(train=False, spatial_axis="spatial"))
        return y

    y_sh = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "spatial"),
                             out_specs=P(), check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)
