"""Torch-checkpoint import (convnet_tpu/utils/torch_import.py).

A user of the reference (eladhoffer/convNet.pytorch) loads checkpoints
with ``torch.load(...); model.load_state_dict(ckpt['state_dict'])``
(reference main.py:~260-290 approx.). These tests build torch twins
with the reference's registration order/naming, export their
state_dict, import into the convnet_tpu model, and require logits
parity in eval mode — covering ResNet-18 (BasicBlock + downsample,
registration order differs from execution order) and a
conv/bn/linear sequential (AlexNet-shaped).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from convnet_tpu import models
from convnet_tpu.core.module import apply_module
from convnet_tpu.utils.torch_import import (import_torch_state_dict,
                                            load_torch_checkpoint)


def _torch_basic_block(cin, cout, stride):
    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)
    return Block()


class _TorchResNet18(nn.Module):
    def __init__(self, classes=21):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = [64, 64, 128, 256, 512]
        for i in range(1, 5):
            stride = 1 if i == 1 else 2
            setattr(self, f"layer{i}", nn.Sequential(
                _torch_basic_block(widths[i - 1], widths[i], stride),
                _torch_basic_block(widths[i], widths[i], 1)))
        self.fc = nn.Linear(512, classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))


def _randomize_bn_stats(tm, rng):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.tensor(
                    rng.standard_normal(m.num_features) * 0.1,
                    dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    1.0 + 0.2 * rng.random(m.num_features),
                    dtype=torch.float32))


def test_import_resnet18_logits_parity():
    rng = np.random.default_rng(0)
    tm = _TorchResNet18()
    _randomize_bn_stats(tm, rng)
    tm.eval()

    model = models.build("resnet", depth=18, num_classes=21)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_import_rejects_shape_mismatch():
    tm = _TorchResNet18(classes=7)  # fc mismatch vs 21-class model
    model = models.build("resnet", depth=18, num_classes=21)
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        import_torch_state_dict(tm.state_dict(), model, params, state)


def test_import_rejects_unit_count_mismatch():
    tm = _TorchResNet18()
    model = models.build("resnet", depth=34, num_classes=21)
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        import_torch_state_dict(tm.state_dict(), model, params, state)


class _TorchCifarResNet20(nn.Module):
    """Reference-style CIFAR ResNet-20 (models/resnet.py:~380-450
    approx. upstream): 3x3 stem, 3 stages x 3 BasicBlocks."""

    def __init__(self, classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 16, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(16)
        widths = [16, 16, 32, 64]
        for i in range(1, 4):
            stride = 1 if i == 1 else 2
            blocks = [_torch_basic_block(widths[i - 1], widths[i], stride)]
            blocks += [_torch_basic_block(widths[i], widths[i], 1)
                       for _ in range(2)]
            setattr(self, f"layer{i}", nn.Sequential(*blocks))
        self.fc = nn.Linear(64, classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.fc(x.mean(dim=(2, 3)))


def test_import_cifar_resnet20_logits_parity():
    rng = np.random.default_rng(2)
    tm = _TorchCifarResNet20()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("resnet", depth=20, dataset="cifar10")
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_import_alexnet_logits_parity():
    """Sequential conv/bn/linear family (reference AlexNet-OWT-BN,
    alexnet.py:~10-90 approx.): torch twin in features/classifier
    registration order."""
    rng = np.random.default_rng(3)

    class TorchAlexNetBN(nn.Module):
        def __init__(self, classes=13):
            super().__init__()

            def cbr(cin, cout, k, s, p):
                return [nn.Conv2d(cin, cout, k, s, p),
                        nn.BatchNorm2d(cout), nn.ReLU()]

            self.features = nn.Sequential(
                *cbr(3, 64, 11, 4, 2), nn.MaxPool2d(3, 2),
                *cbr(64, 192, 5, 1, 2), nn.MaxPool2d(3, 2),
                *cbr(192, 384, 3, 1, 1),
                *cbr(384, 256, 3, 1, 1),
                *cbr(256, 256, 3, 1, 1), nn.MaxPool2d(3, 2))
            self.classifier = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(256 * 6 * 6, 4096), nn.ReLU(),
                nn.Dropout(0.5), nn.Linear(4096, 4096), nn.ReLU(),
                nn.Linear(4096, classes))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(x.flatten(1))

    tm = TorchAlexNetBN()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("alexnet", num_classes=13)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_cli_import_torch_flag(tmp_path):
    """--import-torch PATH initializes CLI training/eval from a
    reference checkpoint (reference resume journey, main.py:~260-290
    approx.)."""
    from convnet_tpu.cli.main import main

    tm = _TorchCifarResNet20()
    tm.eval()
    path = tmp_path / "ref.pth.tar"
    torch.save({"state_dict": tm.state_dict(), "epoch": 3}, path)
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "8", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "imp",
        "--import-torch", str(path),
    ])
    assert np.isfinite(res["best_prec1"])


def test_export_round_trip_logits_parity():
    """Deploy-back journey: our weights exported INTO a torch template
    must make the torch model produce our logits (ResNet-18, random
    convnet_tpu init with randomized BN state)."""
    from convnet_tpu.utils.torch_import import export_into_torch_state_dict
    rng = np.random.default_rng(4)
    model = models.build("resnet", depth=18, num_classes=21)
    params, state = model.init(jax.random.PRNGKey(3))
    # randomize BN running stats so the export is non-trivial
    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        return jax.tree_util.tree_unflatten(
            treedef, [l + 0.05 * rng.standard_normal(l.shape)
                      .astype(np.float32) for l in leaves])
    state = jitter(state)

    tm = _TorchResNet18(classes=21)
    sd = export_into_torch_state_dict(tm.state_dict(), model, params, state)
    tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                       strict=False)  # num_batches_tracked not emitted
    tm.eval()

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_load_checkpoint_file_with_module_prefix(tmp_path):
    """Reference checkpoints are dicts with 'state_dict' (+ epoch /
    best_prec1), possibly DataParallel-prefixed with 'module.'."""
    rng = np.random.default_rng(1)
    tm = _TorchResNet18()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    path = tmp_path / "checkpoint.pth.tar"
    torch.save({"state_dict": sd, "epoch": 7, "best_prec1": 55.5}, path)

    model = models.build("resnet", depth=18, num_classes=21)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, meta = load_torch_checkpoint(str(path), model,
                                                params, state)
    assert meta["epoch"] == 7 and meta["best_prec1"] == 55.5

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_import_vgg11_bn_logits_parity():
    """VGG-11-BN twin (torchvision-style naming: features.N.*,
    classifier.N.*) — deep sequential with five pool boundaries and the
    conv-bias -> BN-mean fold at every conv."""
    rng = np.random.default_rng(6)

    class TorchVGG11BN(nn.Module):
        def __init__(self, classes=11):
            super().__init__()
            cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
                   512, 512, "M"]
            layers, cin = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers += [nn.Conv2d(cin, v, 3, 1, 1),
                               nn.BatchNorm2d(v), nn.ReLU()]
                    cin = v
            self.features = nn.Sequential(*layers)
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(0.5),
                nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout(0.5),
                nn.Linear(4096, classes))

        def forward(self, x):
            return self.classifier(self.features(x).flatten(1))

    tm = TorchVGG11BN()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("vgg", depth=11, num_classes=11)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


# ------------------------------------------------ GoogLeNet + aux heads


class _TConvBN(nn.Module):
    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _TInception(nn.Module):
    def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.b1 = _TConvBN(cin, c1, 1)
        self.b2 = nn.Sequential(_TConvBN(cin, c3r, 1),
                                _TConvBN(c3r, c3, 3, 1, 1))
        self.b3 = nn.Sequential(_TConvBN(cin, c5r, 1),
                                _TConvBN(c5r, c5, 5, 1, 2))
        self.b4 = _TConvBN(cin, pp, 1)

    def forward(self, x):
        p = nn.functional.max_pool2d(x, 3, 1, 1)
        return torch.cat([self.b1(x), self.b2(x), self.b3(x),
                          self.b4(p)], 1)


class _TAuxHead(nn.Module):
    """Input-size-robust aux head matching convnet_tpu's AuxHead
    (1x1 ConvBN bottleneck -> global pool -> fc1 -> fc2)."""

    def __init__(self, cin, classes, hidden=1024):
        super().__init__()
        self.conv = _TConvBN(cin, 128, 1)
        self.fc1 = nn.Linear(128, hidden)
        self.fc2 = nn.Linear(hidden, classes)

    def forward(self, x):
        x = self.conv(x).mean(dim=(2, 3))
        return self.fc2(torch.relu(self.fc1(x)))


class _TorchGoogLeNet(nn.Module):
    """BN-everywhere Inception-v1 twin of convnet_tpu GoogLeNet
    (reference models/googlenet.py:~1-200 approx.). Aux heads are
    registered MID-TRUNK (after i4a/i4d) as torch reference models do —
    a different registration position than convnet_tpu's definition
    order, exercising the name-based aux pairing."""

    def __init__(self, classes=13, aux=False):
        super().__init__()
        self.stem = nn.Sequential(
            _TConvBN(3, 64, 7, 2, 3), nn.MaxPool2d(3, 2, 1),
            _TConvBN(64, 64, 1), _TConvBN(64, 192, 3, 1, 1),
            nn.MaxPool2d(3, 2, 1))
        self.i3a = _TInception(192, 64, 96, 128, 16, 32, 32)
        self.i3b = _TInception(256, 128, 128, 192, 32, 96, 64)
        self.pool3 = nn.MaxPool2d(3, 2, 1)
        self.i4a = _TInception(480, 192, 96, 208, 16, 48, 64)
        if aux:
            self.aux1 = _TAuxHead(512, classes)
        self.i4b = _TInception(512, 160, 112, 224, 24, 64, 64)
        self.i4c = _TInception(512, 128, 128, 256, 24, 64, 64)
        self.i4d = _TInception(512, 112, 144, 288, 32, 64, 64)
        if aux:
            self.aux2 = _TAuxHead(528, classes)
        self.i4e = _TInception(528, 256, 160, 320, 32, 128, 128)
        self.pool4 = nn.MaxPool2d(3, 2, 1)
        self.i5a = _TInception(832, 256, 160, 320, 32, 128, 128)
        self.i5b = _TInception(832, 384, 192, 384, 48, 128, 128)
        self.fc = nn.Linear(1024, classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.pool3(self.i3b(self.i3a(x)))
        x = self.i4e(self.i4d(self.i4c(self.i4b(self.i4a(x)))))
        x = self.pool4(x)
        x = self.i5b(self.i5a(x))
        return self.fc(x.mean(dim=(2, 3)))


def test_import_googlenet_logits_parity():
    """GoogLeNet classifier follows pool/concat: fc in_features (1024)
    differs from the last-walked conv's channels (128 pool-proj), so
    the conv-to-flatten permutation must NOT fire (ADVICE round 2,
    torch_import.py conv-to-flatten heuristic)."""
    rng = np.random.default_rng(7)
    tm = _TorchGoogLeNet()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("googlenet", num_classes=13)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_import_googlenet_aux_checkpoint_into_default_model():
    """A checkpoint carrying aux-head units imports into the default
    (aux-less) model: aux units are dropped with a warning and trunk
    logits match (VERDICT round 2, missing #4)."""
    rng = np.random.default_rng(8)
    tm = _TorchGoogLeNet(aux=True)
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("googlenet", num_classes=13)
    params, state = model.init(jax.random.PRNGKey(0))
    with pytest.warns(UserWarning, match="aux"):
        params, state = import_torch_state_dict(tm.state_dict(), model,
                                                params, state)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_import_googlenet_aux_checkpoint_into_aux_model():
    """Aux-on pairing: torch registers aux heads mid-trunk, convnet_tpu
    defines them last — name-based splitting pairs them; aux-head
    weights land in the right units (verified by comparing the aux1
    conv weight through the layout conversion)."""
    rng = np.random.default_rng(9)
    tm = _TorchGoogLeNet(aux=True)
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("googlenet", num_classes=13, aux_classifiers=True)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    w_torch = tm.aux1.conv.conv.weight.detach().numpy()
    w_ours = np.asarray(params["aux1"]["conv"]["conv"]["w"], np.float32)
    np.testing.assert_allclose(w_ours, np.transpose(w_torch, (2, 3, 1, 0)),
                               rtol=1e-6, atol=1e-6)
    # trunk eval logits unaffected by aux heads
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


# -------------------------------------------------------- DenseNet


def test_import_densenet_logits_parity():
    """DenseNet classifier follows GlobalAvgPool with in_features
    (2*ch at the end of the dense blocks) different from the last
    dense layer's growth channels — the second ADVICE round-2 case for
    the conv-to-flatten permutation gating. Small config for speed."""
    rng = np.random.default_rng(10)
    growth, cfg = 8, [2, 3]

    class TDenseLayer(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, 1, 1, bias=False)

        def forward(self, x):
            y = self.conv1(torch.relu(self.norm1(x)))
            y = self.conv2(torch.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TTransition(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm = nn.BatchNorm2d(cin)
            self.conv = nn.Conv2d(cin, cout, 1, bias=False)

        def forward(self, x):
            return nn.functional.avg_pool2d(
                self.conv(torch.relu(self.norm(x))), 2, 2)

    class TDenseNet(nn.Module):
        def __init__(self, classes=9):
            super().__init__()
            ch = 2 * growth
            self.conv0 = nn.Conv2d(3, ch, 7, 2, 3, bias=False)
            self.norm0 = nn.BatchNorm2d(ch)
            blocks = []
            for i, n in enumerate(cfg):
                for _ in range(n):
                    blocks.append(TDenseLayer(ch))
                    ch += growth
                if i != len(cfg) - 1:
                    blocks.append(TTransition(ch, ch // 2))
                    ch //= 2
            self.blocks = nn.Sequential(*blocks)
            self.norm5 = nn.BatchNorm2d(ch)
            self.classifier = nn.Linear(ch, classes)

        def forward(self, x):
            x = nn.functional.max_pool2d(
                torch.relu(self.norm0(self.conv0(x))), 3, 2, 1)
            x = self.blocks(x)
            x = torch.relu(self.norm5(x))
            return self.classifier(x.mean(dim=(2, 3)))

    tm = TDenseNet()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("densenet", num_classes=9, growth=growth,
                         block_config=cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


class _TIRv2Block(nn.Module):
    """Shared residual-block twin: branches -> concat -> biased 1x1 up
    -> x + scale*up (-> relu unless final)."""

    def __init__(self, scale, final=False):
        super().__init__()
        self.scale, self.final = scale, final

    def forward(self, x):
        outs = [b(x) for b in (getattr(self, n)
                               for n in ("b1", "b2", "b3") if hasattr(self, n))]
        out = x + self.scale * self.up(torch.cat(outs, 1))
        return out if self.final else torch.relu(out)


def _t_block35():
    m = _TIRv2Block(0.17)
    m.b1 = _TConvBN(320, 32, 1)
    m.b2 = nn.Sequential(_TConvBN(320, 32, 1), _TConvBN(32, 32, 3, 1, 1))
    m.b3 = nn.Sequential(_TConvBN(320, 32, 1), _TConvBN(32, 48, 3, 1, 1),
                         _TConvBN(48, 64, 3, 1, 1))
    m.up = nn.Conv2d(128, 320, 1, bias=True)
    return m


def _t_block17():
    m = _TIRv2Block(0.10)
    m.b1 = _TConvBN(1088, 192, 1)
    m.b2 = nn.Sequential(_TConvBN(1088, 128, 1),
                         _TConvBN(128, 160, (1, 7), 1, (0, 3)),
                         _TConvBN(160, 192, (7, 1), 1, (3, 0)))
    m.up = nn.Conv2d(384, 1088, 1, bias=True)
    return m


def _t_block8(final=False):
    m = _TIRv2Block(1.0 if final else 0.20, final=final)
    m.b1 = _TConvBN(2080, 192, 1)
    m.b2 = nn.Sequential(_TConvBN(2080, 192, 1),
                         _TConvBN(192, 224, (1, 3), 1, (0, 1)),
                         _TConvBN(224, 256, (3, 1), 1, (1, 0)))
    m.up = nn.Conv2d(448, 2080, 1, bias=True)
    return m


class _TorchInceptionResNetV2(nn.Module):
    """Twin of convnet_tpu inception_resnet_v2 (reference
    models/inception_resnet_v2.py, Cadene-derived)."""

    def __init__(self, classes=11):
        super().__init__()
        self.stem = nn.Sequential(
            _TConvBN(3, 32, 3, 2), _TConvBN(32, 32, 3),
            _TConvBN(32, 64, 3, 1, 1), nn.MaxPool2d(3, 2),
            _TConvBN(64, 80, 1), _TConvBN(80, 192, 3), nn.MaxPool2d(3, 2))
        m5b = _TIRv2Block(0.0)  # reuse only as a container for branches
        m5b.b1 = _TConvBN(192, 96, 1)
        m5b.b2 = nn.Sequential(_TConvBN(192, 48, 1), _TConvBN(48, 64, 5, 1, 2))
        m5b.b3 = nn.Sequential(_TConvBN(192, 64, 1), _TConvBN(64, 96, 3, 1, 1),
                               _TConvBN(96, 96, 3, 1, 1))
        m5b.b4 = _TConvBN(192, 64, 1)
        m5b.forward = lambda x, s=m5b: torch.cat(
            [s.b1(x), s.b2(x), s.b3(x),
             s.b4(nn.functional.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))], 1)
        self.mixed_5b = m5b
        self.block35 = nn.Sequential(*[_t_block35() for _ in range(10)])
        m6a = _TIRv2Block(0.0)
        m6a.b1 = _TConvBN(320, 384, 3, 2)
        m6a.b2 = nn.Sequential(_TConvBN(320, 256, 1),
                               _TConvBN(256, 256, 3, 1, 1),
                               _TConvBN(256, 384, 3, 2))
        m6a.forward = lambda x, s=m6a: torch.cat(
            [s.b1(x), s.b2(x), nn.functional.max_pool2d(x, 3, 2)], 1)
        self.mixed_6a = m6a
        self.block17 = nn.Sequential(*[_t_block17() for _ in range(20)])
        m7a = _TIRv2Block(0.0)
        m7a.b1 = nn.Sequential(_TConvBN(1088, 256, 1), _TConvBN(256, 384, 3, 2))
        m7a.b2 = nn.Sequential(_TConvBN(1088, 256, 1), _TConvBN(256, 288, 3, 2))
        m7a.b3 = nn.Sequential(_TConvBN(1088, 256, 1),
                               _TConvBN(256, 288, 3, 1, 1),
                               _TConvBN(288, 320, 3, 2))
        m7a.forward = lambda x, s=m7a: torch.cat(
            [s.b1(x), s.b2(x), s.b3(x), nn.functional.max_pool2d(x, 3, 2)], 1)
        self.mixed_7a = m7a
        self.block8 = nn.Sequential(*[_t_block8() for _ in range(9)],
                                    _t_block8(final=True))
        self.conv2d_7b = _TConvBN(2080, 1536, 1)
        self.fc = nn.Linear(1536, classes)

    def forward(self, x):
        x = self.mixed_5b(self.stem(x))
        x = self.mixed_6a(self.block35(x))
        x = self.mixed_7a(self.block17(x))
        x = self.conv2d_7b(self.block8(x))
        return self.fc(x.mean(dim=(2, 3)))


@pytest.mark.slow
def test_import_inception_resnet_v2_logits_parity():
    """Full Inception-ResNet-v2 state_dict import: residual 'up' convs
    carry biases (no BN) and the classifier follows a global pool, so
    both the conv-bias path and the flatten-permutation gating are
    exercised at zoo scale."""
    rng = np.random.default_rng(11)
    tm = _TorchInceptionResNetV2()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("inception_resnet_v2", num_classes=11)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_import_irv2_block35_parity():
    """Fast block-level twin check for the Inception-ResNet residual
    unit: biased up-conv, 0.17 residual scaling, branch concat order."""
    from convnet_tpu.models.inception_resnet_v2 import Block35
    rng = np.random.default_rng(12)
    tm = _t_block35()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    blk = Block35()
    params, state = blk.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), blk,
                                            params, state)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    x = np.repeat(x, 107, axis=1)[:, :320]  # 320 channels
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(blk, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


class _TCat(nn.Module):
    """Concat container: runs declared branches in order, channel-cat.
    Pool-first branches wrap the pool inside nn.Sequential so the
    conv/bn declaration ORDER matches the convnet_tpu module order
    (the importer pairs units positionally)."""

    def __init__(self, *branches):
        super().__init__()
        for i, b in enumerate(branches):
            setattr(self, f"b{i + 1}", b)
        self.n = len(branches)

    def forward(self, x):
        return torch.cat([getattr(self, f"b{i + 1}")(x)
                          for i in range(self.n)], 1)


class _TorchInceptionV4(nn.Module):
    """Order-faithful twin of convnet_tpu models/inception_v4.py."""

    def __init__(self, classes=11):
        super().__init__()

        def A():
            return _TCat(
                _TConvBN(384, 96, 1),
                nn.Sequential(_TConvBN(384, 64, 1), _TConvBN(64, 96, 3, 1, 1)),
                nn.Sequential(_TConvBN(384, 64, 1), _TConvBN(64, 96, 3, 1, 1),
                              _TConvBN(96, 96, 3, 1, 1)),
                nn.Sequential(nn.AvgPool2d(3, 1, 1, count_include_pad=False),
                              _TConvBN(384, 96, 1)))

        def B():
            return _TCat(
                _TConvBN(1024, 384, 1),
                nn.Sequential(_TConvBN(1024, 192, 1),
                              _TConvBN(192, 224, (1, 7), 1, (0, 3)),
                              _TConvBN(224, 256, (7, 1), 1, (3, 0))),
                nn.Sequential(_TConvBN(1024, 192, 1),
                              _TConvBN(192, 192, (7, 1), 1, (3, 0)),
                              _TConvBN(192, 224, (1, 7), 1, (0, 3)),
                              _TConvBN(224, 224, (7, 1), 1, (3, 0)),
                              _TConvBN(224, 256, (1, 7), 1, (0, 3))),
                nn.Sequential(nn.AvgPool2d(3, 1, 1, count_include_pad=False),
                              _TConvBN(1024, 128, 1)))

        def C():
            def split(cin):
                return _TCat(_TConvBN(cin, 256, (1, 3), 1, (0, 1)),
                             _TConvBN(cin, 256, (3, 1), 1, (1, 0)))
            return _TCat(
                _TConvBN(1536, 256, 1),
                nn.Sequential(_TConvBN(1536, 384, 1), split(384)),
                nn.Sequential(_TConvBN(1536, 384, 1),
                              _TConvBN(384, 448, (3, 1), 1, (1, 0)),
                              _TConvBN(448, 512, (1, 3), 1, (0, 1)),
                              split(512)),
                nn.Sequential(nn.AvgPool2d(3, 1, 1, count_include_pad=False),
                              _TConvBN(1536, 256, 1)))

        self.features = nn.Sequential(
            _TConvBN(3, 32, 3, 2), _TConvBN(32, 32, 3),
            _TConvBN(32, 64, 3, 1, 1),
            _TCat(nn.MaxPool2d(3, 2), _TConvBN(64, 96, 3, 2)),      # 3a
            _TCat(nn.Sequential(_TConvBN(160, 64, 1), _TConvBN(64, 96, 3)),
                  nn.Sequential(_TConvBN(160, 64, 1),
                                _TConvBN(64, 64, (1, 7), 1, (0, 3)),
                                _TConvBN(64, 64, (7, 1), 1, (3, 0)),
                                _TConvBN(64, 96, 3))),              # 4a
            _TCat(_TConvBN(192, 192, 3, 2), nn.MaxPool2d(3, 2)),    # 5a
            A(), A(), A(), A(),
            _TCat(_TConvBN(384, 384, 3, 2),                         # redA
                  nn.Sequential(_TConvBN(384, 192, 1),
                                _TConvBN(192, 224, 3, 1, 1),
                                _TConvBN(224, 256, 3, 2)),
                  nn.MaxPool2d(3, 2)),
            B(), B(), B(), B(), B(), B(), B(),
            _TCat(nn.Sequential(_TConvBN(1024, 192, 1),             # redB
                                _TConvBN(192, 192, 3, 2)),
                  nn.Sequential(_TConvBN(1024, 256, 1),
                                _TConvBN(256, 256, (1, 7), 1, (0, 3)),
                                _TConvBN(256, 320, (7, 1), 1, (3, 0)),
                                _TConvBN(320, 320, 3, 2)),
                  nn.MaxPool2d(3, 2)),
            C(), C(), C(),
        )
        self.fc = nn.Linear(1536, classes)

    def forward(self, x):
        x = self.features(x)
        return self.fc(x.mean(dim=(2, 3)))


@pytest.mark.slow
def test_import_inception_v4_logits_parity():
    """Full Inception-v4 state_dict import (completes the inception*
    family — VERDICT r3 #5 / SURVEY §2.2 'Other zoo files'): branched
    split-heads in InceptionC and pool-first branch ordering exercise
    positional unit pairing at zoo scale."""
    rng = np.random.default_rng(13)
    tm = _TorchInceptionV4()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    model = models.build("inception_v4", num_classes=11, dropout=0.0)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(tm.state_dict(), model,
                                            params, state)
    x = rng.standard_normal((2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours, _ = apply_module(model, params, state,
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)
