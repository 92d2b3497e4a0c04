"""Native JPEG decode pipeline (native/jpegdec.cpp + data/native.py).

The C++ path replaces the decode half of the reference's DataLoader
workers (data.py:~200-260 approx.): pread + libjpeg + crop/resize in a
GIL-free thread pool. Eval decode+center-crop matches the
PIL path to within 1 LSB (same libjpeg, same tap geometry; PIL's
8-bit fixed-point resampling coefficients vs float32 here);
train RandomResizedCrop is distribution-equivalent (verified
statistically) and seed-deterministic.
"""

import io
import os
import tarfile

import numpy as np
import pytest

from convnet_tpu.data import native
from convnet_tpu.data.datasets import IndexedTarDataset

pytestmark = pytest.mark.skipif(not native.jpeg_available(),
                                reason="native jpegdec unavailable")


@pytest.fixture(scope="module")
def jpeg_tar(tmp_path_factory):
    from PIL import Image
    path = str(tmp_path_factory.mktemp("tar") / "imagenet_train.tar")
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(10):
            size = 64 + 16 * (i % 3)  # varied sizes
            img = (rng.random((size, size + 8, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=92)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"cls{i % 3}/im{i}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return path


def test_eval_decode_matches_pil_within_1lsb(jpeg_tar):
    """Same libjpeg decode, same tap geometry; PIL resamples uint8 with
    8-bit fixed-point coefficients while the C++ path uses float32, so
    a few percent of pixels may differ by exactly 1 LSB after a
    non-integer resize. Decode+crop geometry must agree everywhere."""
    import random
    from convnet_tpu.data.preprocess import scale_crop_host
    ds = IndexedTarDataset(jpeg_tar)
    idx = np.arange(len(ds))
    out, fail = native.decode_batch(jpeg_tar, ds.offsets[idx],
                                    ds.sizes[idx], train=False,
                                    out_size=56, threads=2)
    assert not fail.any()
    ref = np.stack([
        scale_crop_host(ds[i][0], random.Random(0), out_size=56)
        for i in range(len(ds))])
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.8


def test_rrc_deterministic_and_valid(jpeg_tar):
    ds = IndexedTarDataset(jpeg_tar)
    idx = np.arange(len(ds))
    a, fa = native.decode_batch(jpeg_tar, ds.offsets[idx], ds.sizes[idx],
                                train=True, out_size=48, seed=11, threads=2)
    b, fb = native.decode_batch(jpeg_tar, ds.offsets[idx], ds.sizes[idx],
                                train=True, out_size=48, seed=11, threads=4)
    c, _ = native.decode_batch(jpeg_tar, ds.offsets[idx], ds.sizes[idx],
                               train=True, out_size=48, seed=12, threads=2)
    assert not fa.any() and not fb.any()
    np.testing.assert_array_equal(a, b)  # same seed, any thread count
    assert (a != c).any()                # different seed, different crops
    assert a.shape == (len(ds), 48, 48, 3)
    # crops come from the source image: every pixel inside uint8 range
    # with plausible content (not all-zero)
    assert a.mean() > 10


def test_dataloader_native_path(jpeg_tar):
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    ds = IndexedTarDataset(jpeg_tar)
    tfm = get_transform("imagenet", input_size=48, augment=True)
    assert tfm.native_spec is not None and tfm.native_spec["kind"] == "rrc"
    dl = DataLoader(ds, batch_size=4, transform=tfm, shuffle=True,
                    num_workers=2, device_transform=False, drop_last=True)
    batches = list(iter(dl))
    assert len(batches) == len(ds) // 4
    for xs, ys in batches:
        assert xs.shape == (4, 48, 48, 3) and xs.dtype == np.uint8
        assert ys.shape == (4,) and ys.dtype == np.int32
        assert set(int(v) for v in ys) <= {0, 1, 2}


def test_autoaugment_disables_native_path(jpeg_tar):
    from convnet_tpu.data.preprocess import get_transform
    tfm = get_transform("imagenet", input_size=48, augment=True,
                        autoaugment=True)
    assert tfm.native_spec is None  # PIL path (policy ops not in C++)


def test_decode_blobs_matches_tar_path(jpeg_tar):
    """In-memory decode (serving path) must agree with the tar-offset
    decode at identical geometry."""
    ds = IndexedTarDataset(jpeg_tar)
    idx = np.arange(len(ds))
    via_tar, f1 = native.decode_batch(jpeg_tar, ds.offsets[idx],
                                      ds.sizes[idx], train=False,
                                      out_size=56, threads=2)
    blobs = ds.read_blobs(idx)
    via_mem = native.decode_blobs(blobs, train=False, out_size=56,
                                  threads=2)
    assert via_mem is not None
    out, f2 = via_mem
    assert not f1.any() and not f2.any()
    np.testing.assert_array_equal(via_tar, out)


def test_predict_jpeg_end_to_end(jpeg_tar):
    """serve.predict_jpeg: raw JPEG bytes -> native decode -> jitted
    uint8 inference; classes come back for every blob."""
    from convnet_tpu.serve import Predictor, predict_jpeg
    ds = IndexedTarDataset(jpeg_tar)
    blobs = ds.read_blobs(np.arange(4))
    pred = Predictor("resnet", {"depth": 8, "dataset": "cifar10",
                                "num_classes": 10},
                     dtype="fp32", batch_size=4, normalize="imagenet")
    classes = predict_jpeg(pred, blobs, input_size=32)
    assert classes.shape == (4,)
    assert all(0 <= int(c) < 10 for c in classes)


def test_dataloader_native_duplicates(jpeg_tar):
    """Batch augmentation through the native path: K independent crops
    per decode, labels repeated contiguously (reference --duplicates,
    'Augment your batch' CVPR'20)."""
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    ds = IndexedTarDataset(jpeg_tar)
    tfm = get_transform("imagenet", input_size=48, augment=True,
                        duplicates=3)
    dl = DataLoader(ds, batch_size=2, transform=tfm, shuffle=False,
                    num_workers=2, device_transform=False, drop_last=True)
    xs, ys = next(iter(dl))
    assert xs.shape == (6, 48, 48, 3)
    # labels: each sample's K copies contiguous
    assert list(ys) == [ys[0]] * 3 + [ys[3]] * 3
    # the K copies are DIFFERENT augmentation draws
    assert (xs[0] != xs[1]).any() and (xs[1] != xs[2]).any()


def test_dataloader_native_imagefolder(tmp_path):
    """ImageFolder (loose files) through the native decode path,
    including a non-JPEG member exercising the PIL fallback."""
    from PIL import Image
    from convnet_tpu.data.datasets import ImageFolder
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    rng = np.random.default_rng(2)
    for c in range(2):
        d = tmp_path / f"cls{c}"
        d.mkdir()
        for i in range(3):
            img = (rng.random((72, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(str(d / f"im{i}.jpg"), quality=90)
    # one PNG — libjpeg rejects it, per-sample PIL fallback handles it
    png = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(png).save(str(tmp_path / "cls0" / "zz.png"))

    ds = ImageFolder(str(tmp_path))
    tfm = get_transform("imagenet", input_size=48, augment=True)
    dl = DataLoader(ds, batch_size=7, transform=tfm, shuffle=False,
                    num_workers=2, device_transform=False, drop_last=False)
    xs, ys = next(iter(dl))
    assert xs.shape == (7, 48, 48, 3) and xs.dtype == np.uint8
    assert sorted(set(int(v) for v in ys)) == [0, 1]
    assert all(x.std() > 0 for x in xs)  # every member decoded (incl. png)


def test_dataloader_native_multihost_decorrelation(tmp_path):
    """Multi-host: the native decode seed must include process_index —
    the C++ RNG keys per-sample draws by BATCH-LOCAL position, so
    without it every host draws the identical crop stream. With a tar
    of IDENTICAL images, correlated streams would make host 0's and
    host 1's batches bit-equal."""
    from PIL import Image
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    img = (np.random.default_rng(3).random((96, 96, 3)) * 255).astype(
        np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()
    path = str(tmp_path / "same.tar")
    with tarfile.open(path, "w") as tf:
        for i in range(8):
            info = tarfile.TarInfo(name=f"cls0/im{i}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    ds = IndexedTarDataset(path)
    tfm = get_transform("imagenet", input_size=48, augment=True)
    batches = []
    for rank in range(2):
        dl = DataLoader(ds, batch_size=4, transform=tfm, shuffle=False,
                        num_workers=2, device_transform=False,
                        process_index=rank, process_count=2)
        batches.append(next(iter(dl))[0])
    assert (batches[0] != batches[1]).any()


def test_predict_jpeg_defaults_to_predictor_input_size(jpeg_tar,
                                                       monkeypatch):
    """predict_jpeg with no explicit size must decode at the
    Predictor's configured input_size (which int8 calibration also
    used), not a hardcoded 224."""
    from convnet_tpu.data import native as native_mod
    from convnet_tpu.serve import Predictor, predict_jpeg
    seen = {}
    orig = native_mod.decode_blobs

    def spy(blobs, **kw):
        seen.update(kw)
        return orig(blobs, **kw)

    monkeypatch.setattr(native_mod, "decode_blobs", spy)
    ds = IndexedTarDataset(jpeg_tar)
    blobs = ds.read_blobs(np.arange(2))
    pred = Predictor("resnet", {"depth": 8, "dataset": "cifar10",
                                "num_classes": 10},
                     dtype="fp32", batch_size=2, normalize="imagenet",
                     input_size=32)
    classes = predict_jpeg(pred, blobs)
    assert seen["out_size"] == 32
    assert classes.shape == (2,)


def test_native_decode_env_kill_switch(jpeg_tar, monkeypatch):
    """CONVNET_TPU_NATIVE_DECODE=0 forces the PIL path (repro/debug
    escape hatch) — output batches still come through."""
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    ds = IndexedTarDataset(jpeg_tar)
    tfm = get_transform("imagenet", input_size=48, augment=True)
    monkeypatch.setenv("CONVNET_TPU_NATIVE_DECODE", "0")
    dl = DataLoader(ds, batch_size=4, transform=tfm, shuffle=False,
                    num_workers=2, device_transform=False)
    xs, ys = next(iter(dl))
    assert xs.shape == (4, 48, 48, 3)
