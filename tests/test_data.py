"""Data pipeline tests: loaders, duplicates, regime changes,
transforms, determinism (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_tpu.data import transforms as T
from convnet_tpu.data.data_regime import DataRegime
from convnet_tpu.data.datasets import SyntheticDataset, get_dataset
from convnet_tpu.data.preprocess import get_transform, DATASET_STATS


def test_synthetic_deterministic():
    a = SyntheticDataset(size=16, seed=5)
    b = SyntheticDataset(size=16, seed=5)
    np.testing.assert_array_equal(a.data, b.data)
    np.testing.assert_array_equal(a.labels, b.labels)


def test_array_batcher_shapes_and_epochs():
    dr = DataRegime(defaults={"name": "synthetic", "batch_size": 8,
                              "dataset_kwargs": {"size": 64}})
    loader = dr.get_loader()
    assert len(loader) == 8
    b0 = [np.asarray(y) for _, y in loader]
    loader.set_epoch(1)
    b1 = [np.asarray(y) for _, y in loader]
    # different shuffle order across epochs
    assert not all(np.array_equal(x, y) for x, y in zip(b0, b1))
    # same epoch re-iterated is deterministic
    loader.set_epoch(1)
    b1b = [np.asarray(y) for _, y in loader]
    assert all(np.array_equal(x, y) for x, y in zip(b1, b1b))


def test_duplicates_packing():
    dr = DataRegime(defaults={"name": "synthetic", "batch_size": 4,
                              "duplicates": 3, "augment": False,
                              "dataset_kwargs": {"size": 32}})
    x, y = next(iter(dr.get_loader()))
    assert x.shape[0] == 12
    y = np.asarray(y)
    # duplicates are packed contiguously with identical labels
    assert (y.reshape(4, 3) == y.reshape(4, 3)[:, :1]).all()


def test_regime_rebuilds_loader():
    dr = DataRegime(regime=[{"epoch": 0}, {"epoch": 2, "batch_size": 16}],
                    defaults={"name": "synthetic", "batch_size": 8,
                              "dataset_kwargs": {"size": 64}})
    l0 = dr.get_loader()
    x0, _ = next(iter(l0))
    dr.set_epoch(2)
    l2 = dr.get_loader()
    x2, _ = next(iter(l2))
    assert x0.shape[0] == 8 and x2.shape[0] == 16


def test_progressive_input_size():
    dr = DataRegime(regime=[{"epoch": 0, "input_size": 24},
                            {"epoch": 1, "input_size": 32}],
                    defaults={"name": "synthetic", "batch_size": 4,
                              "dataset_kwargs": {"size": 16}})
    x, _ = next(iter(dr.get_loader()))
    assert x.shape[1] == 24
    dr.set_epoch(1)
    x, _ = next(iter(dr.get_loader()))
    assert x.shape[1] == 32


def test_transform_normalization_stats():
    tf = get_transform("cifar10", augment=False)
    x = jnp.full((2, 32, 32, 3), 128, jnp.uint8)
    out = tf.device(jax.random.PRNGKey(0), x)
    mean = np.asarray(DATASET_STATS["cifar10"]["mean"])
    std = np.asarray(DATASET_STATS["cifar10"]["std"])
    expect = (128 / 255.0 - mean) / std
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect, rtol=1e-5)


def test_pad_random_crop_preserves_shape():
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    out = T.pad_random_crop(jax.random.PRNGKey(1), x, 4)
    assert out.shape == x.shape


def test_cutout_zeroes_region():
    x = jnp.ones((2, 16, 16, 3))
    out = T.cutout(jax.random.PRNGKey(0), x, 8)
    assert float(out.min()) == 0.0
    assert float(out.mean()) < 1.0


def test_hflip_half_probability():
    x = jnp.arange(32, dtype=jnp.float32).reshape(1, 1, 32, 1)
    x = jnp.tile(x, (64, 1, 1, 1))
    out = T.random_hflip(jax.random.PRNGKey(0), x)
    flipped = np.asarray(out[:, 0, 0, 0] != 0)
    assert 10 < flipped.sum() < 54  # ~half


def test_device_random_resized_crop():
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
    out = T.random_resized_crop(jax.random.PRNGKey(1), x, 32)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_imagenet_style_host_pipeline():
    dr = DataRegime(defaults={
        "name": "synthetic_imagenet", "batch_size": 4, "num_workers": 2,
        "input_size": 64, "dataset_kwargs": {"size": 16, "image_size": 96}})
    x, y = next(iter(dr.get_loader()))
    assert x.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_loader_zero_workers_synchronous():
    """``-j 0`` is the reference DataLoader's synchronous mode — it
    must load batches, not crash ThreadPoolExecutor (found by the
    on-chip CLI smoke, scripts/jobs/done/081_irv2_cli_smoke.out)."""
    dr = DataRegime(defaults={
        "name": "synthetic_imagenet", "batch_size": 4, "num_workers": 0,
        "input_size": 64, "dataset_kwargs": {"size": 8, "image_size": 96}})
    x, y = next(iter(dr.get_loader()))
    assert x.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_indexed_tar_dataset(tmp_path):
    import io
    import tarfile
    from PIL import Image
    tar_path = str(tmp_path / "toy.tar")
    with tarfile.open(tar_path, "w") as tf:
        for cls in ("cat", "dog"):
            for i in range(3):
                img = Image.fromarray(
                    np.full((8, 8, 3), i * 40, np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{cls}/{i}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    ds = get_dataset("indexed_tar", tar_path=tar_path)
    assert len(ds) == 6
    img, label = ds[0]
    assert label in (0, 1)
    assert np.asarray(img).shape == (8, 8, 3)
    # index cache reused
    ds2 = get_dataset("indexed_tar", tar_path=tar_path)
    assert len(ds2) == 6


def test_autoaugment_policies_run():
    from convnet_tpu.data.autoaugment import ImageNetPolicy, CIFAR10Policy
    import random
    from PIL import Image
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 256, (32, 32, 3), dtype=np.uint8))
    rng = random.Random(0)
    for policy in (ImageNetPolicy(), CIFAR10Policy()):
        for _ in range(10):
            out = policy(img, rng)
            assert out.size == img.size


def test_model_authored_data_regime():
    """models may author their own data-pipeline schedule (Mix & Match
    progressive resizing) — DataRegime resolves it over epochs."""
    from convnet_tpu import models
    m = models.build("resnet", depth=18, regime="mixmatch", epochs=90)
    assert hasattr(m, "data_regime")
    dr = DataRegime(m.data_regime, defaults={
        "name": "synthetic_imagenet", "batch_size": 4, "num_workers": 2,
        "dataset_kwargs": {"size": 8, "image_size": 96}})
    x, _ = next(iter(dr.get_loader()))
    assert x.shape[1] == 128 or x.shape[1] == 96  # host RRC to 128 req
    dr.set_epoch(80)
    x, _ = next(iter(dr.get_loader()))
    assert x.shape[1] == 224
