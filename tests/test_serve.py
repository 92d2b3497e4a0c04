"""Predictor (serving path) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu.serve import Predictor
from convnet_tpu.utils.checkpoint import save_checkpoint
from convnet_tpu import models
from convnet_tpu.core.module import Context
from convnet_tpu.data.preprocess import DATASET_STATS


def test_predictor_basic():
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  dtype="float32", batch_size=8, impl="xla")
    x = np.random.default_rng(0).random((5, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x)
    assert logits.shape == (5, 10)
    classes = p.predict(x)
    assert classes.shape == (5,)
    top3 = p.predict(x, topk=3)
    assert top3.shape == (5, 3)


def test_predictor_from_checkpoint(tmp_path):
    m = models.build("resnet", dataset="cifar10", depth=20)
    params, state = m.init(jax.random.PRNGKey(7))
    save_checkpoint({"params": params, "state": state, "epoch": 0},
                    False, str(tmp_path))
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  checkpoint=str(tmp_path), dtype="float32", batch_size=4,
                  impl="xla", normalize=None)
    x = np.random.default_rng(1).random((9, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x)
    assert logits.shape == (9, 10)
    # absorb-bn predictor (normalization disabled) must match the raw
    # model's eval forward on the same tensor
    y_ref, _ = m(params, state, jnp.asarray(x), Context(train=False))
    np.testing.assert_allclose(logits, np.asarray(y_ref), rtol=1e-3,
                               atol=1e-3)


def test_predictor_self_describing_checkpoint(tmp_path):
    """model_name=None: framework checkpoints record model+config at
    save time (cli/main.py), so serving needs only the path — mirrors
    the reference's rebuild-from-saved-config resume (main.py resume
    branch). input_size resolves from the recorded dataset (32)."""
    m = models.build("resnet", dataset="cifar10", depth=20)
    params, state = m.init(jax.random.PRNGKey(3))
    save_checkpoint({"params": params, "state": state, "epoch": 0,
                     "model": "resnet",
                     "config": {"dataset": "cifar10", "depth": 20}},
                    False, str(tmp_path))
    p = Predictor.from_checkpoint(str(tmp_path), dtype="float32",
                                  batch_size=4, impl="xla", normalize=None)
    assert p.input_size == 32
    x = np.random.default_rng(4).random((3, 32, 32, 3)).astype(np.float32)
    y_ref, _ = m(params, state, jnp.asarray(x), Context(train=False))
    np.testing.assert_allclose(p.predict_logits(x), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-3)
    # a checkpoint without recorded model metadata must fail loudly
    save_checkpoint({"params": params, "state": state, "epoch": 0},
                    False, str(tmp_path), filename="bare.npz")
    import pytest
    with pytest.raises(ValueError, match="model_name"):
        Predictor(checkpoint=str(tmp_path / "bare.npz"))


def test_predictor_applies_dataset_normalization(tmp_path):
    """The serving forward must apply the SAME mean/std normalization
    the training pipeline applied (data/preprocess.py), resolved from
    the checkpoint's dataset config — raw [0,1] (or uint8) inputs then
    produce the logits the trained model expects."""
    m = models.build("resnet", dataset="cifar10", depth=20)
    params, state = m.init(jax.random.PRNGKey(7))
    save_checkpoint({"params": params, "state": state, "epoch": 0,
                     "config": {"dataset": "cifar10", "depth": 20}},
                    False, str(tmp_path))
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  checkpoint=str(tmp_path), dtype="float32", batch_size=4,
                  impl="xla")  # normalize="auto" → cifar10 stats
    x01 = np.random.default_rng(1).random((4, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x01)
    stats = DATASET_STATS["cifar10"]
    x_norm = (x01 - np.asarray(stats["mean"], np.float32)) / \
        np.asarray(stats["std"], np.float32)
    y_ref, _ = m(params, state, jnp.asarray(x_norm), Context(train=False))
    np.testing.assert_allclose(logits, np.asarray(y_ref), rtol=1e-3,
                               atol=1e-3)
    # uint8 path: /255 then normalize, same result
    x_u8 = (x01 * 255).astype(np.uint8)
    logits_u8 = p.predict_logits(x_u8)
    y_ref_u8, _ = m(params, state,
                    jnp.asarray((x_u8.astype(np.float32) / 255.0
                                 - np.asarray(stats["mean"], np.float32))
                                / np.asarray(stats["std"], np.float32)),
                    Context(train=False))
    np.testing.assert_allclose(logits_u8, np.asarray(y_ref_u8), rtol=1e-3,
                               atol=1e-3)


def test_predictor_data_parallel_serving():
    """devices='all': weights replicate, the compiled batch shards over
    a 1-D mesh of the 8 virtual devices — logits must be identical to
    the single-device predictor, and the compiled HLO must contain NO
    collectives (inference has no cross-sample ops, so data-parallel
    serving is pure sharding, zero communication)."""
    kw = dict(model_config={"dataset": "cifar10", "depth": 8},
              dtype="float32", batch_size=8, impl="xla", normalize=None)
    single = Predictor("resnet", **kw)
    multi = Predictor("resnet", devices="all", **kw)
    # identical init (PRNGKey(0) both) → identical logits expected
    x = np.random.default_rng(3).random((20, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(multi.predict_logits(x),
                               single.predict_logits(x),
                               rtol=1e-4, atol=1e-4)

    # sharding really happened: 8 shards, one per device
    xb = jax.device_put(jnp.zeros((8, 32, 32, 3), jnp.float32),
                        multi._x_sharding)
    assert len({s.device for s in xb.addressable_shards}) == \
        len(jax.local_devices())
    # zero collectives in the compiled serving step
    hlo = multi._forward.lower(multi.params, multi.state, xb) \
        .compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll}"

    import pytest
    with pytest.raises(ValueError, match="single-device"):
        multi.export()
    with pytest.raises(ValueError, match="divisible"):
        Predictor("resnet", devices=3,
                  model_config={"dataset": "cifar10", "depth": 8},
                  batch_size=8)


def test_predictor_uint8_input():
    p = Predictor("mnist", batch_size=4, dtype="float32", impl="xla")
    x = np.random.default_rng(0).integers(0, 256, (3, 28, 28, 1),
                                          dtype=np.uint8)
    logits = p.predict_logits(x)
    assert logits.shape == (3, 10)


def test_predictor_from_torch_checkpoint(tmp_path):
    """Serving straight from a PyTorch reference checkpoint (the
    reference evaluate journey) — logits must match the torch model."""
    import torch
    from tests.test_torch_import import (_TorchCifarResNet20,
                                         _randomize_bn_stats)
    rng = np.random.default_rng(5)
    tm = _TorchCifarResNet20()
    _randomize_bn_stats(tm, rng)
    tm.eval()
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": tm.state_dict(), "epoch": 2}, path)

    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  checkpoint=str(path), dtype="float32", batch_size=4,
                  impl="xla", normalize=None)
    x = rng.random((5, 32, 32, 3)).astype(np.float32)
    logits = p.predict_logits(x)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(logits, ref, rtol=1e-3, atol=1e-3)


def test_torch_checkpoint_routing_by_content(tmp_path):
    """Checkpoint routing sniffs file content, not suffix (ADVICE
    round 2): a native .npz renamed to .pt must route to the native
    loader; a torch zip file named oddly must route to torch.load."""
    import io
    import numpy as np
    import torch
    from convnet_tpu.serve import _is_torch_checkpoint

    npz_as_pt = tmp_path / "renamed.pt"
    np.savez(str(npz_as_pt), a=np.zeros(3))
    # np.savez appends .npz when missing — normalize the name
    produced = (npz_as_pt if npz_as_pt.exists()
                else tmp_path / "renamed.pt.npz")
    target = tmp_path / "model.pt"
    produced.rename(target)
    assert _is_torch_checkpoint(str(target)) is False

    torch_as_bin = tmp_path / "weights.bin"
    torch.save({"state_dict": {}}, str(torch_as_bin))
    assert _is_torch_checkpoint(str(torch_as_bin)) is True

    legacy = tmp_path / "legacy.pth.tar"
    torch.save({"x": 1}, str(legacy), _use_new_zipfile_serialization=False)
    assert _is_torch_checkpoint(str(legacy)) is True


def test_export_stablehlo_roundtrip(tmp_path):
    """Predictor.export → self-contained StableHLO artifact →
    ExportedPredictor serves identical logits with no model code or
    checkpoint at the loading site (weights + preprocessing baked in)."""
    from convnet_tpu.serve import ExportedPredictor, load_exported
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 8},
                  dtype="float32", batch_size=4, impl="xla",
                  input_size=32)
    x = np.random.default_rng(2).integers(0, 256, (6, 32, 32, 3), np.uint8)
    ref = p.predict_logits(x)

    art = tmp_path / "rn8.stablehlo"
    data = p.export(str(art))
    assert art.exists() and art.stat().st_size == len(data)

    # load from file path and from raw bytes
    for src in (str(art), data):
        ep = load_exported(src)
        assert isinstance(ep, ExportedPredictor)
        assert ep.batch_size == 4 and ep.input_size == 32
        out = ep.predict_logits(x)  # padding/chunking: 6 = 4 + 2
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert load_exported(data).predict(x).shape == (6,)


def test_predictor_restores_recorded_input_size(tmp_path):
    """A checkpoint trained at a non-default --input-size must serve at
    that size, not the dataset default (serve.py input_size precedence:
    checkpoint meta -> model.input_size -> dataset default)."""
    m = models.build("resnet", dataset="cifar10", depth=20)
    params, state = m.init(jax.random.PRNGKey(3))
    save_checkpoint({"params": params, "state": state, "epoch": 0,
                     "model": "resnet",
                     "config": {"dataset": "cifar10", "depth": 20},
                     "input_size": 24},
                    False, str(tmp_path))
    p = Predictor(checkpoint=str(tmp_path), dtype="float32",
                  batch_size=4, impl="xla")
    assert p.input_size == 24
    # explicit argument still wins over the recorded size
    p2 = Predictor(checkpoint=str(tmp_path), dtype="float32",
                   batch_size=4, impl="xla", input_size=32)
    assert p2.input_size == 32


def test_predictor_prefers_model_native_input_size():
    """Without a recorded size, a model that declares its own native
    geometry (inception family: 299) beats the dataset default."""
    p = Predictor("resnet", {"dataset": "cifar10", "depth": 20},
                  dtype="float32", batch_size=4, impl="xla")
    assert p.input_size == 32  # dataset default (no model attr)
    p.model.input_size = 299  # simulate an inception-style model
    # precedence is applied at construction; re-resolve via a new
    # Predictor with the attribute patched through a subclass shim
    import convnet_tpu.serve as serve_mod

    class _Shim(serve_mod.Predictor):
        pass

    orig_build = serve_mod.models.build

    def patched(name, **cfg):
        mdl = orig_build(name, **cfg)
        mdl.input_size = 299
        return mdl

    serve_mod.models.build = patched
    try:
        p3 = _Shim("resnet", {"dataset": "cifar10", "depth": 20},
                   dtype="float32", batch_size=4, impl="xla")
        assert p3.input_size == 299
    finally:
        serve_mod.models.build = orig_build


@pytest.mark.slow
def test_predictor_agrees_with_cli_eval_path(tmp_path):
    """End-to-end deployment contract (round-5 verify-job 148 follow-up):
    a checkpoint produced by the SHIPPED CLI trainer, reloaded through
    the self-describing Predictor and fed raw uint8 val images, must
    reproduce the eval path's accuracy on the full val split — serving
    and evaluation are the same function of the checkpoint. (Job 148
    first asserted an absolute bar at 2 epochs, where BN running stats
    are immature; the binding property is AGREEMENT, plus a convergence
    floor at a depth/epoch point known to generalize — mirrors
    test_cli.py::test_structured_synthetic_generalization.)"""
    from convnet_tpu.cli.main import main
    from convnet_tpu.data.datasets import get_dataset

    res = main([
        "--dataset", "synthetic_structured", "--model", "resnet",
        "--model-config", "{'depth': 8}",
        "-b", "64", "--epochs", "5", "--print-freq", "0", "--lr", "0.05",
        "--results-dir", str(tmp_path), "--save", "st",
    ])
    best = res["best_prec1"]
    assert best > 80.0, res

    p = Predictor.from_checkpoint(str(tmp_path / "st" / "model_best.npz"))
    ds = get_dataset("synthetic_structured", "val", data_dir=None)
    xs = np.stack([np.asarray(ds[i][0]) for i in range(len(ds))])
    ys = np.array([ds[i][1] for i in range(len(ds))])
    top1 = 100.0 * float((np.asarray(p.predict(xs)) == ys).mean())
    # bf16 + absorb-bn serving vs the eval pass: a few tenths of a
    # point of argmax flips are expected; disagreement beyond 2 points
    # means serving preprocessing/geometry diverged from training
    assert abs(top1 - best) < 2.0, (top1, best)
