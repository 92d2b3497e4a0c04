"""Model zoo construction + forward shape/dtype tests, plus
block-level parity vs a hand-built torch equivalent (SURVEY.md §4
'Model parity' — torchvision is unavailable here, so parity is checked
at the ConvBN-block level with copied weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from convnet_tpu import models
from convnet_tpu.core.module import Context, param_count
from convnet_tpu.models.resnet import ConvBN

EXPECTED_PARAMS = {
    # canonical counts
    ("resnet", frozenset({("depth", 50)})): 25_557_032,
    ("resnet", frozenset({("depth", 18)})): 11_689_512,
    ("resnet", frozenset({("dataset", "cifar10"), ("depth", 20)})): 272_474,
    ("resnet", frozenset({("dataset", "cifar10"), ("depth", 56)})): 855_770,
    ("mobilenet_v2", frozenset()): 3_504_872,
    # AlexNet-OWT with BatchNorm: canonical bias-less convs + BN affine
    # (torchvision's BN-less AlexNet is 61,100,840; +2304 BN affine
    # −1152 conv biases = +1152)
    ("alexnet", frozenset()): 61_101_992,
}


@pytest.mark.parametrize("name,cfg,in_shape,classes", [
    ("resnet", {"depth": 18}, (2, 64, 64, 3), 1000),
    ("resnet", {"depth": 50}, (2, 64, 64, 3), 1000),
    ("resnet", {"dataset": "cifar10", "depth": 20}, (2, 32, 32, 3), 10),
    ("resnet", {"dataset": "cifar100", "depth": 20}, (2, 32, 32, 3), 100),
    ("resnet_se", {"dataset": "cifar10", "depth": 20}, (2, 32, 32, 3), 10),
    ("resnet_zi", {"dataset": "cifar10", "depth": 20}, (2, 32, 32, 3), 10),
    ("mobilenet", {"width": 0.5}, (2, 64, 64, 3), 1000),
    pytest.param("mobilenet_v2", {"width": 1.0}, (2, 64, 64, 3), 1000,
                 marks=pytest.mark.slow),
    ("vgg", {"dataset": "cifar10", "depth": 11}, (2, 32, 32, 3), 10),
    ("mnist", {}, (2, 28, 28, 1), 10),
    pytest.param("densenet", {"depth": 121}, (2, 64, 64, 3), 1000,
                 marks=pytest.mark.slow),
    ("googlenet", {}, (2, 64, 64, 3), 1000),
])
def test_model_forward(name, cfg, in_shape, classes):
    model = models.build(name, **cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), in_shape)
    y, new_state = model(params, state, x,
                         Context(train=True, rng=jax.random.PRNGKey(2)))
    assert y.shape == (in_shape[0], classes)
    assert np.isfinite(np.asarray(y)).all()
    ye, _ = model(params, state, x, Context(train=False))
    assert ye.shape == (in_shape[0], classes)


@pytest.mark.slow
def test_param_counts_canonical():
    for (name, cfg), expected in EXPECTED_PARAMS.items():
        model = models.build(name, **dict(cfg))
        params, _ = model.init(jax.random.PRNGKey(0))
        assert param_count(params) == expected, (name, dict(cfg))


def test_models_have_regimes():
    for name in ["resnet", "mobilenet", "mobilenet_v2", "alexnet",
                 "googlenet", "vgg", "mnist", "densenet"]:
        cfg = {"dataset": "cifar10"} if name in ("resnet", "vgg") else {}
        model = models.build(name, **cfg)
        regime = model.regime
        assert isinstance(regime, list) and regime
        assert "optimizer" in regime[0]


def test_zero_init_residual():
    model = models.build("resnet_zi", dataset="cifar10", depth=20)
    params, _ = model.init(jax.random.PRNGKey(0))
    # last BN gamma of each block starts at zero
    gamma = params["layers"]["layer1"]["0"]["cb2"]["bn"]["scale"]
    np.testing.assert_array_equal(np.asarray(gamma), 0.0)


def test_convbn_block_parity_torch():
    """ConvBN(3x3, stride 2) forward == torch Conv2d+BatchNorm2d+ReLU
    with identical weights (train mode, same batch)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8, 10, 10)).astype(np.float32)
    w = rng.standard_normal((16, 8, 3, 3)).astype(np.float32)
    gamma = rng.standard_normal(16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)

    blk = ConvBN(8, 16, 3, 2, 1)
    params, state = blk.init(jax.random.PRNGKey(0))
    params["conv"]["w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    params["bn"]["scale"] = jnp.asarray(gamma)
    params["bn"]["bias"] = jnp.asarray(beta)

    y, _ = blk(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
               Context(train=True, rng=jax.random.PRNGKey(1)))

    conv = torch.nn.Conv2d(8, 16, 3, 2, 1, bias=False)
    bn = torch.nn.BatchNorm2d(16)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        bn.weight.copy_(torch.tensor(gamma))
        bn.bias.copy_(torch.tensor(beta))
    bn.train()
    yt = torch.relu(bn(conv(torch.tensor(x)))).detach().numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), yt, rtol=1e-3, atol=1e-4)


def test_se_block_gating():
    from convnet_tpu.nn.se import SEBlock
    se = SEBlock(8, reduction=2)
    params, state = se.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 4, 4, 8))
    y, _ = se(params, state, x, Context())
    assert y.shape == x.shape
    # gate is sigmoid-bounded
    ratio = np.asarray(y / x)
    assert (ratio > 0).all() and (ratio < 1).all()


def test_checkpoint_module_equivalence():
    """Remat wrapper computes identical outputs and gradients."""
    from convnet_tpu.nn.checkpoint import CheckpointModule
    blk = ConvBN(4, 4, 3, 1, 1)
    wrapped = CheckpointModule(blk)
    params, state = blk.init(jax.random.PRNGKey(0))
    wp, ws = {"module": params}, {"module": state}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = Context(train=False)

    def f_plain(p, x):
        return jnp.sum(blk(p, state, x, ctx)[0])

    def f_remat(p, x):
        return jnp.sum(wrapped({"module": p}, ws, x, ctx)[0])

    np.testing.assert_allclose(float(f_plain(params, x)),
                               float(f_remat(params, x)), rtol=1e-6)
    g1 = jax.grad(f_plain)(params, x)
    g2 = jax.grad(f_remat)(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5), g1, g2)


def test_space_to_depth_roundtrip():
    from convnet_tpu.nn.layers import SpaceToDepth
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y, _ = SpaceToDepth(2)({}, {}, x, None)
    assert y.shape == (2, 4, 4, 12)
    # every input value present exactly once
    np.testing.assert_array_equal(np.sort(np.asarray(y).ravel()),
                                  np.sort(np.asarray(x).ravel()))


def test_resnet_s2d_stem_forward():
    m = models.build("resnet", depth=18, stem="s2d")
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y, _ = m(params, state, x, Context(train=True,
                                       rng=jax.random.PRNGKey(2)))
    assert y.shape == (2, 1000)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_inception_v3():
    m = models.build("inception_v3")
    params, state = m.init(jax.random.PRNGKey(0))
    assert param_count(params) == 23_834_568  # canonical (no aux head)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 299, 299, 3))
    y, _ = m(params, state, x, Context(train=True,
                                       rng=jax.random.PRNGKey(2)))
    assert y.shape == (2, 1000)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_inception_resnet_v2():
    m = models.build("inception_resnet_v2")
    params, state = m.init(jax.random.PRNGKey(0))
    assert param_count(params) == 55_843_464  # canonical (Cadene/timm)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    y, new_state = m(params, state, x, Context(train=True,
                                               rng=jax.random.PRNGKey(2)))
    assert y.shape == (2, 1000)
    assert np.isfinite(np.asarray(y)).all()
    # BN stats update during training
    before = jax.tree_util.tree_leaves(state["stem"])
    after = jax.tree_util.tree_leaves(new_state["stem"])
    assert any(np.any(np.asarray(a) != np.asarray(b))
               for a, b in zip(after, before))
    assert m.regime[0]["optimizer"] == "SGD" and m.input_size == 299


@pytest.mark.slow
def test_googlenet_aux_heads():
    """Aux classifiers (reference models/googlenet.py aux branches):
    training forward collects two 0.3-weighted logit sets; eval never
    collects; the combined trainer loss injects gradients into the aux
    heads."""
    m = models.build("googlenet", aux_classifiers=True)
    params, state = m.init(jax.random.PRNGKey(0))
    assert "aux1" in params and "aux2" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ctx = Context(train=True, rng=jax.random.PRNGKey(2), aux=[])
    y, new_state = m(params, state, x, ctx)
    assert y.shape == (2, 1000)
    assert len(ctx.aux) == 2
    for w, logits in ctx.aux:
        assert w == 0.3
        assert logits.shape == (2, 1000)
        assert np.isfinite(np.asarray(logits)).all()
    # aux BN stats update during training
    assert "aux1" in new_state

    ctx_eval = Context(train=False, aux=[])
    m(params, state, x, ctx_eval)
    assert ctx_eval.aux == []

    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(print_freq=0))
    yl = jnp.zeros((2,), jnp.int32)

    def scalar_loss(p):
        return tr._loss_fn(p, state, x, yl, jax.random.PRNGKey(3), None)[0]

    grads = jax.grad(scalar_loss)(params)
    for head in ("aux1", "aux2"):
        g = grads[head]["classifier"]["fc2"]["w"]
        assert float(jnp.abs(g).max()) > 0.0
    # the aux losses actually enter the total
    loss_with = scalar_loss(params)
    tr_noaux = Trainer(models.build("googlenet"), OptimRegime(m.regime),
                       1000, TrainerConfig(print_freq=0))
    params_noaux = {k: v for k, v in params.items()
                    if k not in ("aux1", "aux2")}
    state_noaux = {k: v for k, v in state.items()
                   if k not in ("aux1", "aux2")}
    loss_main = tr_noaux._loss_fn(params_noaux, state_noaux, x, yl,
                                  jax.random.PRNGKey(3), None)[0]
    assert float(loss_with) != float(loss_main)


@pytest.mark.slow
def test_inception_v3_aux_head():
    m = models.build("inception_v3", aux_classifiers=True)
    params, state = m.init(jax.random.PRNGKey(0))
    assert "aux" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    ctx = Context(train=True, rng=jax.random.PRNGKey(2), aux=[])
    y, new_state = m(params, state, x, ctx)
    assert y.shape == (2, 1000)
    assert len(ctx.aux) == 1
    w, logits = ctx.aux[0]
    assert w == 0.4 and logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(logits)).all()
    # the manual tapped block walk must match the plain Sequential path
    y_plain, _ = m(params, state, x,
                   Context(train=True, rng=jax.random.PRNGKey(2)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)


def test_aux_loss_mechanism_unit():
    """Fast wiring test of Context.aux + Trainer._loss_fn: a dummy
    model with a known aux contribution → total = main + w*aux CE."""
    from convnet_tpu.core.module import Module
    from convnet_tpu.nn import Linear
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    from convnet_tpu.train.losses import CrossEntropyLoss

    class Dummy(Module):
        def __init__(self):
            self.fc = Linear(4, 3)
            self.aux_fc = Linear(4, 3)

        def __call__(self, params, state, x, ctx):
            y, _ = self.fc(params["fc"], {}, x, ctx)
            if ctx.train and ctx.aux is not None:
                a, _ = self.aux_fc(params["aux_fc"], {}, x, ctx)
                ctx.aux.append((0.5, a))
            return y, state

    m = Dummy()
    m.regime = [{"epoch": 0, "optimizer": "SGD", "lr": 0.1}]
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    y = jnp.array([0, 1, 2, 0, 1], jnp.int32)
    tr = Trainer(m, OptimRegime(m.regime), 3, TrainerConfig(print_freq=0))
    loss, (_, logits) = tr._loss_fn(params, state, x, y,
                                    jax.random.PRNGKey(2), None)
    ce = CrossEntropyLoss()
    main = ce(logits, y)
    aux_logits = x @ params["aux_fc"]["w"] + params["aux_fc"]["b"]
    expected = main + 0.5 * ce(aux_logits, y)
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-6)
    # aux params receive gradient through the trainer loss
    g = jax.grad(lambda p: tr._loss_fn(p, state, x, y,
                                       jax.random.PRNGKey(2), None)[0])(params)
    assert float(jnp.abs(g["aux_fc"]["w"]).max()) > 0


@pytest.mark.slow
def test_inception_v4():
    """Inception-v4 (completes the reference's inception* family,
    Szegedy et al. 2017; reference models/inception*.py, SURVEY.md
    §2.2 'Other zoo files')."""
    m = models.build("inception_v4")
    params, state = m.init(jax.random.PRNGKey(0))
    assert param_count(params) == 42_679_816  # canonical (Cadene/timm)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    y, new_state = m(params, state, x, Context(train=True,
                                               rng=jax.random.PRNGKey(2)))
    assert y.shape == (2, 1000)
    assert np.isfinite(np.asarray(y)).all()
    # eval path (dropout off, running stats) also finite
    y2, _ = m(params, new_state, x, Context(train=False))
    assert np.isfinite(np.asarray(y2)).all()
    assert m.regime[0]["optimizer"] == "SGD" and m.input_size == 299
