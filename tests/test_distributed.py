"""Distributed-without-a-cluster tests on the 8-fake-device CPU mesh
(SURVEY.md §4): sharded training == single-device training, and
cross-replica BN == unsharded full-batch BN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu import models, ops
from convnet_tpu.parallel.mesh import make_mesh, shard_batch
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 fake devices")]


def _batch(b=16):
    rng = np.random.default_rng(0)
    return (rng.standard_normal((b, 32, 32, 3)).astype(np.float32),
            rng.integers(0, 10, (b,)).astype(np.int32))


def test_cross_replica_bn_matches_unsharded():
    """pmean of per-shard moments == full-batch moments."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 4, 4, 8)).astype(np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    r_mean = np.zeros(8, np.float32)
    r_var = np.ones(8, np.float32)

    y_ref, m_ref, v_ref = ops.batch_norm_train(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(r_mean), jnp.asarray(r_var))

    def sharded(x, scale, bias, rm, rv):
        y, m, v = ops.batch_norm_train(
            x, scale, bias, rm, rv, axis_name="data",
            axis_size=8)
        return y, m, v

    f = shard_map(sharded, mesh=mesh,
                  in_specs=(P("data"), P(), P(), P(), P()),
                  out_specs=(P("data"), P(), P()),
                  check_vma=False)
    y_sh, m_sh, v_sh = jax.jit(f)(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(r_mean), jnp.asarray(r_var))

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-6)
    # unbiased correction uses the GLOBAL count under sync BN → exact match
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-5)


def _train_steps(mesh, sync_bn, n_steps=3):
    model = models.build("resnet", dataset="cifar10", depth=20)
    optim = OptimRegime(model.regime)
    tr = Trainer(model, optim, 10,
                 TrainerConfig(print_freq=0, sync_bn=sync_bn), mesh=mesh,
                 seed=7)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, opt_state = tr.initialize(params, state)
    optim.update(0, 0)
    hp = tr._hp_device(optim.hyperparams())
    step = tr._get_train_step()
    x, y = _batch()
    losses = []
    for i in range(n_steps):
        bx, by = jnp.asarray(x), jnp.asarray(y)
        if mesh is not None:
            bx, by = shard_batch((bx, by), mesh)
        params, state, opt_state, m = step(params, state, opt_state, bx, by,
                                           hp, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    return losses, jax.device_get(params)


def test_sharded_equals_single_device_with_sync_bn():
    """With cross-replica BN, an 8-way sharded step must reproduce the
    single-device step (same data, same rng) — gradients pmean-ed over
    shards equal the full-batch gradient.

    Note: single-device BN over the full batch IS "sync" BN of shards.
    Params are compared after ONE step (tight — only fp32
    reduction-order noise); losses are compared across 3 steps (step
    k's loss depends on step k-1's params, so agreement over steps
    means the updates track without divergence).
    """
    _, params_1_one = _train_steps(None, sync_bn=False, n_steps=1)
    _, params_8_one = _train_steps(make_mesh(8), sync_bn=True, n_steps=1)
    # atol: BN-scale grads are sums of ~1e4 ±O(1) terms — cancellation
    # amplifies fp32 reduction-order noise to ~1e-4 on the gradient,
    # i.e. ~1e-5 on the param after an lr=0.1 step.
    for a, b in zip(jax.tree_util.tree_leaves(params_1_one),
                    jax.tree_util.tree_leaves(params_8_one)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)

    losses_1, _ = _train_steps(None, sync_bn=False)
    losses_8, _ = _train_steps(make_mesh(8), sync_bn=True)
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-3)


def test_ghost_bn_differs_from_sync():
    """Per-replica (ghost) BN statistics produce a different forward
    than cross-replica BN — i.e. the switch actually does something."""
    losses_sync, _ = _train_steps(make_mesh(8), sync_bn=True)
    losses_ghost, _ = _train_steps(make_mesh(8), sync_bn=False)
    assert not np.allclose(losses_sync, losses_ghost, rtol=1e-6)


def test_validate_on_mesh():
    mesh = make_mesh(8)
    model = models.build("resnet", dataset="cifar10", depth=20)
    tr = Trainer(model, OptimRegime(model.regime), 10,
                 TrainerConfig(print_freq=0), mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, _ = tr.initialize(params, state)
    x, y = _batch()
    res = tr.validate([(x, y)], params, state)
    assert 0 <= res["prec1"] <= 100
    assert np.isfinite(res["loss"])


def test_validate_remainder_batch_on_mesh():
    """Eval batches not divisible by the mesh size are padded and the
    padding is masked out of loss/accuracy."""
    mesh = make_mesh(8)
    model = models.build("resnet", dataset="cifar10", depth=20)
    tr = Trainer(model, OptimRegime(model.regime), 10,
                 TrainerConfig(print_freq=0), mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, _ = tr.initialize(params, state)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((13, 32, 32, 3)).astype(np.float32)  # 13 % 8 != 0
    y = rng.integers(0, 10, (13,)).astype(np.int32)
    res_mesh = tr.validate([(x, y)], params, state)
    # must equal the single-device result on the same 13 samples
    tr1 = Trainer(model, OptimRegime(model.regime), 10,
                  TrainerConfig(print_freq=0))
    p1, s1 = model.init(jax.random.PRNGKey(0))
    p1, s1, _ = tr1.initialize(p1, s1)
    res_1 = tr1.validate([(x, y)], p1, s1)
    assert res_mesh["prec1"] == pytest.approx(res_1["prec1"], abs=1e-6)
    assert res_mesh["loss"] == pytest.approx(res_1["loss"], rel=1e-4)


def test_bf16_allreduce_tracks_fp32():
    """--allreduce-dtype bf16 (half the ICI/DCN gradient bytes) keeps
    the sharded step close to the fp32-all-reduce step."""
    x, y = _batch()

    def run(ar):
        model = models.build("resnet", dataset="cifar10", depth=20)
        tr = Trainer(model, OptimRegime(model.regime), 10,
                     TrainerConfig(print_freq=0, sync_bn=True,
                                   allreduce_dtype=ar),
                     mesh=make_mesh(8), seed=7)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        bx, by = shard_batch((jnp.asarray(x), jnp.asarray(y)), make_mesh(8))
        p, s, o, m = step(p, s, o, bx, by, hp, jax.random.PRNGKey(50))
        return jax.device_get(p), float(m["grad_norm"])

    p_fp32, gn_fp32 = run(None)
    p_bf16, gn_bf16 = run("bf16")
    assert gn_bf16 == pytest.approx(gn_fp32, rel=5e-2)
    for a, b in zip(jax.tree_util.tree_leaves(p_fp32),
                    jax.tree_util.tree_leaves(p_bf16)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=5e-3)


def test_zero1_checkpoint_resume_bitwise(tmp_path):
    """Save → restore under --shard-opt-state must (a) keep the moment
    vectors SHARDED (placement-preserving restore, not re-replication)
    and (b) continue bit-identically to an uninterrupted run."""
    from convnet_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint, tree_dtype_cast_like,
        tree_place_like)

    model = models.build("resnet", dataset="cifar10", depth=20)
    rng = np.random.default_rng(4)
    batches = [(rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
                rng.integers(0, 10, (16,)).astype(np.int32))
               for _ in range(3)]

    def make():
        tr = Trainer(model, OptimRegime(model.regime), 10,
                     TrainerConfig(print_freq=0, sync_bn=True,
                                   shard_opt_state=True),
                     mesh=make_mesh(8), seed=7)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        tr.optim.update(0, 0)
        return tr, p, s, o

    def steps(tr, p, s, o, batch_list, seed0):
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        for i, (x, y) in enumerate(batch_list):
            bx, by = tr._shard(jnp.asarray(x), jnp.asarray(y))
            p, s, o, _ = step(p, s, o, bx, by, hp,
                              jax.random.PRNGKey(seed0 + i))
        return p, s, o

    # straight: 1 step, checkpoint, 2 more steps
    tr, p, s, o = make()
    p, s, o = steps(tr, p, s, o, batches[:1], 50)
    f = save_checkpoint({"epoch": 0, "params": p, "state": s,
                         "opt_state": o}, False, str(tmp_path))
    p, s, o = steps(tr, p, s, o, batches[1:], 51)
    straight = jax.device_get(p)

    # resumed: fresh trainer, CLI-style placement-preserving restore
    tr2, p2, s2, o2 = make()
    ckpt = load_checkpoint(f)
    p2 = tree_place_like(tree_dtype_cast_like(ckpt["params"], p2), p2)
    s2 = tree_place_like(tree_dtype_cast_like(ckpt["state"], s2), s2)
    o2 = tree_place_like(tree_dtype_cast_like(ckpt["opt_state"], o2), o2)
    # moments stayed sharded 1/8 per device after restore
    shard_sizes = {sh.data.shape[0] for sh in o2["mu"].addressable_shards}
    assert shard_sizes == {o2["mu"].shape[0] // 8}
    p2, s2, o2 = steps(tr2, p2, s2, o2, batches[1:], 51)
    resumed = jax.device_get(p2)
    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


def test_adapt_grad_norm_on_mesh_matches_single_device():
    """adapt-grad-norm under data parallelism: the measured scale must
    be computed from the CROSS-REPLICA sub-batch gradient (pmean), so
    every replica applies the same scale and the sharded step equals
    the single-device step on the same global batch.

    Regression: round 1 measured on the local shard only with no
    collective — per-replica scales diverged and params silently
    desynchronized."""
    rng = np.random.default_rng(3)
    # 8 distinct samples × 2 contiguous duplicates = global batch 16
    # → 2 samples/replica on the 8-way mesh (duplicates don't straddle
    # shard boundaries, matching the loader's np.repeat packing)
    x = np.repeat(rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
                  2, axis=0)
    y = np.repeat(rng.integers(0, 10, 8), 2).astype(np.int32)

    def run(mesh):
        model = models.build("resnet", dataset="cifar10", depth=20)
        tr = Trainer(model, OptimRegime(model.regime), 10,
                     TrainerConfig(print_freq=0, sync_bn=mesh is not None,
                                   duplicates=2, adapt_grad_norm=1),
                     mesh=mesh, seed=7)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        bx, by = jnp.asarray(x), jnp.asarray(y)
        if mesh is not None:
            bx, by = shard_batch((bx, by), mesh)
        p, s, o, m = step(p, s, o, bx, by, hp, jax.random.PRNGKey(50))
        return jax.device_get(p), float(o["agn_scale"])

    params_1, scale_1 = run(None)
    params_8, scale_8 = run(make_mesh(8))
    assert scale_8 == pytest.approx(scale_1, rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_zero1_sharded_optimizer_matches_replicated():
    """ZeRO-1 (reduce-scatter grads → shard-local update → all-gather
    params) reproduces the replicated-optimizer update, with moments
    actually sharded (1/n per device)."""
    model = models.build("resnet", dataset="cifar10", depth=20)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, (16,)).astype(np.int32)

    def run(shard_opt, n_steps):
        mesh = make_mesh(8) if shard_opt is not None else None
        tr = Trainer(model, OptimRegime(model.regime), 10,
                     TrainerConfig(print_freq=0, sync_bn=True,
                                   shard_opt_state=bool(shard_opt)),
                     mesh=mesh, seed=7)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        losses = []
        for i in range(n_steps):
            bx, by = tr._shard(jnp.asarray(x), jnp.asarray(y))
            p, s, o, m = step(p, s, o, bx, by, hp, jax.random.PRNGKey(50 + i))
            losses.append(float(m["loss"]))
        return losses, jax.device_get(p), o

    # one-step params tight (only fp32 reduction-order noise, see
    # test_sharded_equals_single_device_with_sync_bn for the atol note)
    _, params_z1, _ = run(True, 1)
    _, params_r1, _ = run(None, 1)
    for a, b in zip(jax.tree_util.tree_leaves(params_r1),
                    jax.tree_util.tree_leaves(params_z1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
    # 3-step loss trajectories agree (each step consumes the previous
    # step's params → updates track without divergence)
    losses_z, _, opt_z = run(True, 3)
    losses_r, _, _ = run(None, 3)
    np.testing.assert_allclose(losses_z, losses_r, rtol=2e-3)
    # moments are flat, padded, and sharded 1/8 per device
    mu = opt_z["mu"]
    assert mu.ndim == 1
    assert len(mu.sharding.device_set) == 8
    shard_sizes = {s.data.shape[0] for s in mu.addressable_shards}
    assert shard_sizes == {mu.shape[0] // 8}


@pytest.mark.parametrize("opt_name", ["LARS", "LAMB"])
def test_layerwise_sharded_step_exact(opt_name):
    """parallel/zero.py lars/lamb_step_sharded vs the replicated
    regimes.optim step on identical inputs: the segment-reduced
    per-leaf norms must reproduce the layer-wise math exactly (only
    fp32 reduction-order noise allowed)."""
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P
    from convnet_tpu.train.trainer import _shard_map_fn as shard_map
    from convnet_tpu.parallel import zero
    from convnet_tpu.regimes import optim as ro
    from convnet_tpu.utils.param_filter import wd_mask

    rng = np.random.default_rng(2)
    params = {
        "conv": {"w": jnp.asarray(rng.standard_normal((3, 3, 4, 8)),
                                  jnp.float32)},
        "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        "fc": {"w": jnp.asarray(rng.standard_normal((8, 10)), jnp.float32),
               "b": jnp.zeros(10)},
    }
    grads = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype), params)
    hp = {k: jnp.float32(v) for k, v in ro.HP_DEFAULTS.items()}
    hp.update({"lr": jnp.float32(0.5), "momentum": jnp.float32(0.9),
               "weight_decay": jnp.float32(1e-3),
               "trust_coef": jnp.float32(0.01)})

    # replicated reference update
    update = ro.make_update_fn(opt_name, params)
    init_state = ro.init_opt_state(params, with_adam=True)
    ref_params, _ = update(params, grads, init_state, hp)

    # sharded update on the 8-device mesh
    mesh = make_mesh(8)
    n = 8
    padded = zero.flat_size(params, n)
    size = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    mask = zero.flat_mask01(params, wd_mask(params), n)
    seg = zero.leaf_segment_ids(params, n)
    lmask = zero.leaf_mask01(params, wd_mask(params))
    n_leaves = len(jax.tree_util.tree_leaves(params))
    axis = list(mesh.axis_names)[0]

    def sharded(params, grads):
        flat_g, _ = ravel_pytree(grads)
        flat_g = jnp.pad(flat_g, (0, padded - flat_g.shape[0]))
        # grads identical on every shard → psum_scatter/n == slice
        g_slice = zero.shard_slice(flat_g, axis)
        flat_p, unravel = ravel_pytree(params)
        flat_p = jnp.pad(flat_p, (0, padded - flat_p.shape[0]))
        p_slice = zero.shard_slice(flat_p, axis)
        opt = {"step": jnp.zeros((), jnp.int32),
               "mu": jnp.zeros_like(p_slice),
               "m": jnp.zeros_like(p_slice),
               "v": jnp.zeros_like(p_slice)}
        mask_slice = zero.shard_slice(jnp.asarray(mask), axis)
        seg_slice = zero.shard_slice(jnp.asarray(seg), axis)
        leaves = jax.tree_util.tree_leaves(params)
        w_sq = jnp.stack([jnp.sum(jnp.square(l.astype(jnp.float32)))
                          for l in leaves])
        if opt_name == "LARS":
            p_slice, _ = zero.lars_step_sharded(
                p_slice, g_slice, opt, hp, mask01=mask_slice,
                seg_slice=seg_slice, w_sq=w_sq, n_leaves=n_leaves,
                axis_name=axis)
        else:
            p_slice, _ = zero.lamb_step_sharded(
                p_slice, g_slice, opt, hp, mask01=mask_slice,
                seg_slice=seg_slice, w_sq=w_sq,
                leaf_mask=jnp.asarray(lmask), n_leaves=n_leaves,
                axis_name=axis)
        return zero.gather_params(p_slice, unravel, size, axis)

    fn = shard_map(sharded, mesh=mesh,
                   in_specs=(P(), P()), out_specs=P(),
                   check_vma=False)
    out = jax.jit(fn)(params, grads)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("opt_name,extra", [
    ("LARS", {"momentum": 0.9, "trust_coef": 0.01, "weight_decay": 1e-4,
              "lr": 0.1}),
    ("LAMB", {"weight_decay": 1e-2, "lr": 1e-2}),
])
def test_zero1_layerwise_optimizer_matches_replicated(opt_name, extra):
    """LARS/LAMB under ZeRO-1 through the full trainer: trajectories
    must track the replicated run. Tolerances are looser than the SGD
    twin above — sync-BN fp32 reduction-order noise is amplified by the
    trust ratio (LARS) and by the sign-like step-1 update m̂/√v̂
    (LAMB); exactness of the sharded step math itself is pinned by
    test_layerwise_sharded_step_exact."""
    model = models.build("resnet", dataset="cifar10", depth=20)
    regime = [{"epoch": 0, "optimizer": opt_name, **extra}]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, (16,)).astype(np.int32)

    def run(shard_opt, n_steps):
        mesh = make_mesh(8) if shard_opt else None
        tr = Trainer(model, OptimRegime(list(regime)), 10,
                     TrainerConfig(print_freq=0, sync_bn=True,
                                   shard_opt_state=shard_opt),
                     mesh=mesh, seed=7)
        p, s = model.init(jax.random.PRNGKey(0))
        p, s, o = tr.initialize(p, s)
        tr.optim.update(0, 0)
        hp = tr._hp_device(tr.optim.hyperparams())
        step = tr._get_train_step()
        losses = []
        for i in range(n_steps):
            bx, by = tr._shard(jnp.asarray(x), jnp.asarray(y))
            p, s, o, m = step(p, s, o, bx, by, hp, jax.random.PRNGKey(90 + i))
            losses.append(float(m["loss"]))
        return losses, jax.device_get(p)

    _, params_z = run(True, 1)
    _, params_r = run(False, 1)
    # LAMB's step-1 update is lr·ratio·sign(g) elementwise, so a grad
    # element near 0 can flip sign between reduction orders, bounding
    # the per-element diff at 2·lr·ratio — a few such flips are
    # expected and harmless. Allow them explicitly (≤1% of elements,
    # each ≤ 2.1·lr) instead of loosening the global tolerance.
    lr = extra.get("lr", 0.5)
    n_total, n_bad = 0, 0
    for a, b in zip(jax.tree_util.tree_leaves(params_r),
                    jax.tree_util.tree_leaves(params_z)):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(b - a)
        bad = diff > (5e-4 + 5e-3 * np.abs(a))
        n_total += bad.size
        n_bad += int(bad.sum())
        if bad.any():
            assert opt_name == "LAMB", f"max diff {diff.max():.2e}"
            assert diff[bad].max() <= 2.1 * lr
    assert n_bad <= max(1, 0.01 * n_total), f"{n_bad}/{n_total} flips"
    losses_z, _ = run(True, 3)
    losses_r, _ = run(False, 3)
    np.testing.assert_allclose(losses_z, losses_r, rtol=5e-3)


def test_calibrate_bn_on_mesh_equals_single_device():
    """Mesh calibrate_bn (round-2 VERDICT weak #5): sharding the
    calibration batch over the data axis and pmean-ing the moments
    must reproduce the single-device full-batch result."""
    model = models.build("resnet", dataset="cifar10", depth=20)
    optim = OptimRegime(model.regime)
    params, state = model.init(jax.random.PRNGKey(0))
    x, y = _batch(16)
    loader = [(x, y), (x * 0.5 + 0.1, y)]

    tr1 = Trainer(model, optim, 10, TrainerConfig(print_freq=0))
    ref = tr1.calibrate_bn(loader, params, state, num_steps=2)

    tr8 = Trainer(model, optim, 10, TrainerConfig(print_freq=0),
                  mesh=make_mesh(8))
    got = tr8.calibrate_bn(loader, params, state, num_steps=2)

    ref_l, treedef = jax.tree_util.tree_flatten(ref)
    got_l, treedef2 = jax.tree_util.tree_flatten(got)
    assert treedef == treedef2
    for a, b in zip(ref_l, got_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
