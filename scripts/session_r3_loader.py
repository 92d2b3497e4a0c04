"""Round-3 input-pipeline proof (VERDICT missing #2).

Measures, on this container, the stages of the real-data path
(IndexedTarDataset + native pread pool + threaded DataLoader with
PIL decode + RandomResizedCrop):

  1. tar index build (native C++ scan)
  2. raw blob read bandwidth (C++ pread pool)
  3. decode+transform throughput vs thread count
  4. end-to-end DataLoader img/s at the ImageNet-train transform

The container has 1 vCPU (os.cpu_count() reports the cgroup limit
host, see PERF_NOTES session 10), so absolute throughput here is a
LOWER bound dominated by single-core PIL decode; the per-core
decode rate × a real v5e host's 112 vCPU gives the deployment
estimate recorded in the output.

Usage: python scripts/session_r3_loader.py [tar_path]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# never touch the axon device from this process (the persistent TPU
# worker holds the grant; an accidental device op would queue on it)
import jax
jax.config.update("jax_platforms", "cpu")

OUT = open("/root/repo/scripts/session_r3_loader_results.txt", "a")


def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


def main(tar_path="/tmp/synth_imagenet.tar"):
    from convnet_tpu.data.datasets import IndexedTarDataset
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform

    log(f"cpu_count={os.cpu_count()} "
        f"affinity={len(os.sched_getaffinity(0))}")

    t0 = time.time()
    ds = IndexedTarDataset(tar_path)
    log(f"index build ({len(ds)} imgs): {time.time()-t0:.2f}s "
        f"(native={ds.use_native})")

    # raw read bandwidth through the C++ pread pool
    idx = np.arange(min(1000, len(ds)))
    t0 = time.time()
    blobs = ds.read_blobs(idx)
    dt = time.time() - t0
    mb = sum(len(b) for b in blobs) / 1e6
    log(f"raw blob read: {len(idx)} blobs {mb:.0f} MB in {dt:.2f}s "
        f"= {mb/dt:.0f} MB/s, {len(idx)/dt:.0f} blobs/s")

    # single-image decode+transform cost
    import random as _random
    tfm = get_transform("imagenet", input_size=224, augment=True)
    img, _ = ds[0]
    t0 = time.time()
    k = 50
    for _ in range(k):
        tfm.host(img, _random.Random(0))
    per = (time.time() - t0) / k
    log(f"decode-less host transform: {per*1e3:.1f} ms/img "
        f"= {1/per:.0f} img/s/core")
    t0 = time.time()
    for i in range(k):
        img_i, _ = ds[i % len(ds)]
        tfm.host(img_i, _random.Random(0))
    per_full = (time.time() - t0) / k
    log(f"read+decode+host-transform: {per_full*1e3:.1f} ms/img "
        f"= {1/per_full:.0f} img/s/core")

    # end-to-end threaded DataLoader
    for workers in (1, 4, 8):
        dl = DataLoader(ds, batch_size=64, transform=tfm, shuffle=True,
                        num_workers=workers, device_transform=False)
        it = iter(dl)
        next(it)  # warm
        t0 = time.time()
        n = 0
        for _ in range(8):
            batch = next(it)
            n += len(batch[1])
        dt = time.time() - t0
        log(f"DataLoader workers={workers}: {n/dt:.0f} img/s")

    per_core = 1 / per_full
    log(f"deployment estimate: {per_core:.0f} img/s/core x 112 vCPU "
        f"(real v5e host) = {per_core*112:.0f} img/s >> 2447 img/s chip "
        f"demand; this 1-core container is loader-bound by construction")


if __name__ == "__main__":
    main(*sys.argv[1:2])


def native_bench(tar_path="/tmp/synth_imagenet.tar"):
    """Native C++ decode pipeline vs the PIL thread pool."""
    from convnet_tpu.data.datasets import IndexedTarDataset
    from convnet_tpu.data.loader import DataLoader
    from convnet_tpu.data.preprocess import get_transform
    from convnet_tpu.data import native

    ds = IndexedTarDataset(tar_path)
    log(f"native jpeg available: {native.jpeg_available()}")
    idx = np.arange(256)
    for threads in (1, 4, 8):
        t0 = time.time()
        for _ in range(4):
            out, fail = native.decode_batch(
                tar_path, ds.offsets[idx], ds.sizes[idx], train=True,
                out_size=224, seed=1, threads=threads)
        dt = (time.time() - t0) / 4
        log(f"native decode+RRC threads={threads}: "
            f"{len(idx)/dt:.0f} img/s (fails {int(fail.sum())})")

    tfm = get_transform("imagenet", input_size=224, augment=True)
    dl = DataLoader(ds, batch_size=64, transform=tfm, shuffle=True,
                    num_workers=8, device_transform=False)
    it = iter(dl)
    next(it)
    t0 = time.time()
    n = 0
    for _ in range(12):
        batch = next(it)
        n += len(batch[1])
    log(f"DataLoader end-to-end (native path): {n/(time.time()-t0):.0f} img/s")
