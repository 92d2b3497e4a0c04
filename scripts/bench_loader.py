"""Input-pipeline throughput benchmark.

Generates a synthetic JPEG corpus (ImageFolder layout AND an indexed
tar), then measures end-to-end loader throughput (decode + host RRC +
batch assembly) for both the thread-pool path and the native
blob-read path. A v5e chip consumes ~2100 img/s training ResNet-50
(scripts/PERF_NOTES.md) — the loader must beat that to keep it fed.

Usage: python scripts/bench_loader.py [--n 2000] [--workers 16]
"""

import argparse
import io
import os
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_corpus(root, n, size=320):
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    tar_path = os.path.join(root, "corpus.tar")
    with tarfile.open(tar_path, "w") as tf:
        for i in range(n):
            cls = f"class{i % 10}"
            cdir = os.path.join(root, "train", cls)
            os.makedirs(cdir, exist_ok=True)
            img = Image.fromarray(rng.integers(0, 256, (size, size, 3),
                                               dtype=np.uint8))
            p = os.path.join(cdir, f"{i}.jpg")
            img.save(p, quality=85)
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=85)
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{cls}/{i}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return os.path.join(root, "train"), tar_path


def bench(loader, n_epochs=1):
    count = 0
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        for x, y in loader:
            count += np.asarray(y).shape[0]
    dt = time.perf_counter() - t0
    return count / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from convnet_tpu.data.datasets import ImageFolder, IndexedTarDataset
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    from convnet_tpu.data import native

    with tempfile.TemporaryDirectory() as root:
        folder, tar = make_corpus(root, args.n)
        tf = get_transform("imagenet", input_size=224, augment=True)

        ds = ImageFolder(folder)
        loader = DataLoader(ds, tf, args.batch, num_workers=args.workers,
                            device_transform=False)
        r1 = bench(loader)
        print(f"ImageFolder path:      {r1:,.0f} img/s "
              f"({args.workers} workers, decode+RRC @224)")

        ds2 = IndexedTarDataset(tar)
        loader2 = DataLoader(ds2, tf, args.batch, num_workers=args.workers,
                             device_transform=False)
        r2 = bench(loader2)
        native_str = "native" if native.available() else "python"
        print(f"IndexedTar path ({native_str}): {r2:,.0f} img/s")

        cores = os.cpu_count() or 1
        per_core = max(r1, r2) / cores
        print(f"≈{per_core:,.0f} img/s/core on {cores} core(s); a v5e "
              f"host (~100+ vCPU) projects to ~{per_core * 100:,.0f} img/s "
              f"— ResNet-50 train consumes ~2100 img/s/chip")


if __name__ == "__main__":
    main()
