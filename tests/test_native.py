"""Native C++ data-IO runtime tests (native/dataio.cpp via ctypes).

Builds the shared library on first use (make); skips if no toolchain.
"""

import io
import os
import tarfile

import numpy as np
import pytest

from convnet_tpu.data import native


def _toy_tar(tmp_path, n_classes=2, per_class=3):
    from PIL import Image
    tar_path = str(tmp_path / "toy.tar")
    with tarfile.open(tar_path, "w") as tf:
        for c in range(n_classes):
            for i in range(per_class):
                img = Image.fromarray(
                    np.full((8, 8, 3), c * 100 + i, np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"class{c}/{i}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return tar_path


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_tar_index_matches_tarfile(tmp_path):
    tar_path = _toy_tar(tmp_path)
    offsets, sizes, names = native.tar_index(tar_path)
    with tarfile.open(tar_path) as tf:
        ref = [(m.offset_data, m.size, m.name) for m in tf if m.isfile()]
    assert len(offsets) == len(ref)
    for (o, s, n), (ro, rs, rn) in zip(zip(offsets, sizes, names), ref):
        assert (o, s, n) == (ro, rs, rn)


@needs_native
def test_batch_read(tmp_path):
    tar_path = _toy_tar(tmp_path)
    offsets, sizes, names = native.tar_index(tar_path)
    blobs = native.batch_read(tar_path, offsets, sizes, threads=4)
    with open(tar_path, "rb") as f:
        for o, s, blob in zip(offsets, sizes, blobs):
            f.seek(o)
            assert f.read(int(s)) == blob


@needs_native
def test_indexed_tar_native_path(tmp_path):
    from convnet_tpu.data.datasets import IndexedTarDataset
    tar_path = _toy_tar(tmp_path)
    ds = IndexedTarDataset(tar_path)
    assert len(ds) == 6
    assert ds.num_classes == 2
    blobs = ds.read_blobs([0, 3, 5])
    img = ds.decode(blobs[0])
    assert np.asarray(img).shape == (8, 8, 3)
    # native and python index agree
    os.remove(tar_path + ".idx.npz")
    ds_py = IndexedTarDataset(tar_path, use_native=False)
    np.testing.assert_array_equal(ds.offsets, ds_py.offsets)
    np.testing.assert_array_equal(ds.labels, ds_py.labels)


@needs_native
def test_loader_blob_mode(tmp_path):
    from convnet_tpu.data.datasets import IndexedTarDataset
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    tar_path = _toy_tar(tmp_path, n_classes=2, per_class=8)
    ds = IndexedTarDataset(tar_path)
    tf = get_transform("imagenet", input_size=16, augment=False)
    loader = DataLoader(ds, tf, batch_size=4, num_workers=2,
                        device_transform=False)
    batches = list(loader)
    assert len(batches) == 4
    xs, ys = batches[0]
    assert xs.shape == (4, 16, 16, 3)
