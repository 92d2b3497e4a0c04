"""Training-trajectory equivalence vs PyTorch (SURVEY.md §4, VERDICT r1 #6).

The reference's de-facto verification is end-to-end accuracy on real
datasets, which this container cannot run (no datasets). The strongest
available substitute: a torch twin of ResNet-8/CIFAR with IDENTICAL
weights (HWIO→OIHW), an identical fixed batch stream, and the same
SGD+momentum+decoupled-WD regime, trained side by side in fp32 on CPU —
per-step losses must agree step for step. This pins down the whole
optimization stack (conv/BN forward, autograd, CE loss, momentum,
decoupled WD with param filtering, BN running-stat EMA) against
torch.optim.SGD semantics, not just single-op parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from convnet_tpu import models
from convnet_tpu.regimes.optim import OptimRegime
from convnet_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.slow


LR = 0.05
MOMENTUM = 0.9
WD = 1e-4
STEPS = 40
BATCH = 32


class _TorchBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, 0, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class _TorchResNet8(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.stem_conv = torch.nn.Conv2d(3, 16, 3, 1, 1, bias=False)
        self.stem_bn = torch.nn.BatchNorm2d(16)
        self.layer1 = _TorchBlock(16, 16, 1)
        self.layer2 = _TorchBlock(16, 32, 2)
        self.layer3 = _TorchBlock(32, 64, 2)
        self.fc = torch.nn.Linear(64, 10)

    def forward(self, x):
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _copy_convbn(tmod_conv, tmod_bn, cb_params, cb_state):
    with torch.no_grad():
        # HWIO → OIHW
        tmod_conv.weight.copy_(torch.tensor(
            np.asarray(cb_params["conv"]["w"]).transpose(3, 2, 0, 1)))
        tmod_bn.weight.copy_(torch.tensor(np.asarray(cb_params["bn"]["scale"])))
        tmod_bn.bias.copy_(torch.tensor(np.asarray(cb_params["bn"]["bias"])))
        tmod_bn.running_mean.copy_(
            torch.tensor(np.asarray(cb_state["bn"]["mean"])))
        tmod_bn.running_var.copy_(
            torch.tensor(np.asarray(cb_state["bn"]["var"])))


def _build_twin(params, state):
    tm = _TorchResNet8()
    _copy_convbn(tm.stem_conv, tm.stem_bn, params["stem"], state["stem"])
    for name, tblock in (("layer1", tm.layer1), ("layer2", tm.layer2),
                         ("layer3", tm.layer3)):
        bp = params["layers"][name]["0"]
        bs = state["layers"][name]["0"]
        _copy_convbn(tblock.conv1, tblock.bn1, bp["cb1"], bs["cb1"])
        _copy_convbn(tblock.conv2, tblock.bn2, bp["cb2"], bs["cb2"])
        if tblock.downsample is not None:
            _copy_convbn(tblock.downsample[0], tblock.downsample[1],
                         bp["downsample"], bs["downsample"])
    with torch.no_grad():
        tm.fc.weight.copy_(torch.tensor(np.asarray(params["fc"]["w"]).T))
        tm.fc.bias.copy_(torch.tensor(np.asarray(params["fc"]["b"])))
    return tm


def _torch_sgd_step(model, loss, bufs):
    """Exact twin of regimes/optim.py sgd_step: mu = m·mu + g;
    p = p·(1 − lr·wd_masked) − lr·mu. WD decays conv/fc weights only
    (utils/param_filter wd_mask: biases and BN params excluded)."""
    model.zero_grad()
    loss.backward()
    with torch.no_grad():
        for name, p in model.named_parameters():
            g = p.grad
            buf = bufs.get(name)
            buf = g.clone() if buf is None else buf.mul_(MOMENTUM).add_(g)
            bufs[name] = buf
            decayed = (name.endswith("weight") and "bn" not in name
                       and not isinstance(
                           dict(model.named_modules())[
                               name.rsplit(".", 1)[0]],
                           torch.nn.BatchNorm2d))
            if decayed:
                p.mul_(1.0 - LR * WD)
            p.add_(buf, alpha=-LR)


def test_training_trajectory_matches_torch():
    model = models.build("resnet", dataset="cifar10", depth=8)
    params, state = model.init(jax.random.PRNGKey(11))
    torch_model = _build_twin(params, state)
    torch_model.train()

    regime = [{"epoch": 0, "optimizer": "SGD", "lr": LR,
               "momentum": MOMENTUM,
               "regularizer": {"name": "WeightDecay", "value": WD}}]
    tr = Trainer(model, OptimRegime(regime), 10,
                 TrainerConfig(print_freq=0), seed=0)
    params, state, opt_state = tr.initialize(params, state)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()

    rng = np.random.default_rng(42)
    # two fixed batches cycled → memorization dynamics, same stream
    stream = [(rng.standard_normal((BATCH, 32, 32, 3)).astype(np.float32),
               rng.integers(0, 10, BATCH).astype(np.int64))
              for _ in range(2)]

    bufs = {}
    losses_jax, losses_torch = [], []
    for i in range(STEPS):
        x, y = stream[i % 2]
        params, state, opt_state, m = step(
            params, state, opt_state, jnp.asarray(x),
            jnp.asarray(y.astype(np.int32)), hp, jax.random.PRNGKey(i))
        losses_jax.append(float(m["loss"]))

        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        loss_t = F.cross_entropy(torch_model(xt), torch.tensor(y))
        losses_torch.append(loss_t.item())
        _torch_sgd_step(torch_model, loss_t, bufs)

    losses_jax = np.asarray(losses_jax)
    losses_torch = np.asarray(losses_torch)
    # early steps: near-exact (fp32 op-order noise only)
    np.testing.assert_allclose(losses_jax[:10], losses_torch[:10],
                               rtol=1e-3, atol=1e-4)
    # full trajectory: drift stays bounded through 40 coupled updates
    np.testing.assert_allclose(losses_jax, losses_torch,
                               rtol=2e-2, atol=2e-3)
    # and training actually progressed (memorization, not a frozen net)
    assert losses_jax[-1] < losses_jax[0] * 0.7
