"""Input pipeline: device-resident batcher + threaded host loader.

TPU-native replacement for the reference's
``torch.utils.data.DataLoader(num_workers=...)`` worker processes
(data.py:~200–260 approx., SURVEY.md §2.1 "DataLoader worker
processes"). Two paths:

- ``ArrayBatcher`` — for in-memory datasets (CIFAR/MNIST/synthetic):
  the WHOLE dataset lives in device memory (uint8); each batch is a
  device-side gather + the jitted augmentation fn. Zero per-step
  host↔device traffic, async dispatch gives free double-buffering.

- ``DataLoader`` — for decode-heavy datasets (ImageFolder / indexed
  tar): a thread pool decodes+host-transforms samples (PIL releases
  the GIL in decode/resize), an assembler thread keeps a bounded queue
  of ready uint8 batches, and the consumer applies the jitted device
  transform. Supports shuffling (epoch-seeded, deterministic),
  drop_last, duplicates (batch augmentation — K host-transform draws
  per sample, packed contiguously so eval can average over them), and
  per-host sharding for multi-host runs (DistributedSampler
  equivalent: each process reads its contiguous shard of the epoch
  permutation).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu.data.preprocess import Transform


def _epoch_permutation(n, epoch, seed, shuffle):
    if not shuffle:
        return np.arange(n)
    rng = np.random.default_rng(np.uint32([seed, epoch]))
    return rng.permutation(n)


class ArrayBatcher:
    """Device-resident batching for ArrayDataset-style datasets."""

    def __init__(self, dataset, transform: Transform, batch_size: int,
                 shuffle=True, drop_last=True, seed=0,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count
        self._data_dev = jax.device_put(np.asarray(dataset.data))
        self._labels = np.asarray(dataset.labels)
        self._gather_augment = jax.jit(
            lambda data, idx, key: transform.device(
                key, jnp.take(data, idx, axis=0)))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        perm = _epoch_permutation(n, self.epoch, self.seed, self.shuffle)
        shard = perm[self.process_index::self.process_count]
        num = len(self)
        dup = self.transform.duplicates
        key = jax.random.PRNGKey(np.uint32([self.seed, self.epoch]).sum())
        for b in range(num):
            idx = shard[b * self.batch_size:(b + 1) * self.batch_size]
            if dup > 1:
                idx = np.repeat(idx, dup)
            key, k = jax.random.split(key)
            x = self._gather_augment(self._data_dev, jnp.asarray(idx), k)
            y = jnp.asarray(np.repeat(self._labels[idx[::dup]], dup)
                            if dup > 1 else self._labels[idx])
            yield x, y


class DataLoader:
    """Threaded host pipeline for decode-heavy datasets."""

    def __init__(self, dataset, transform: Transform, batch_size: int,
                 shuffle=True, drop_last=True, num_workers: int = 8, seed=0,
                 prefetch: int = 3, device_transform: bool = True,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.device_transform = device_transform
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_sample(self, args):
        idx, sample_seed, dup = args
        import random as _random
        rng = _random.Random(sample_seed)
        sample, label = self.dataset[idx]
        arr = self.transform.host(sample, rng, dup)
        return arr, label

    def _decode_blob(self, args):
        blob, label, sample_seed, dup = args
        import random as _random
        rng = _random.Random(sample_seed)
        arr = self.transform.host(self.dataset.decode(blob), rng, dup)
        return arr, label

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        perm = _epoch_permutation(n, self.epoch, self.seed, self.shuffle)
        shard = perm[self.process_index::self.process_count]
        num_batches = len(self)
        dup = self.transform.duplicates
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        # workers=0 mirrors the reference DataLoader's synchronous mode
        # (num_workers=0 loads in the main process): one thread, no
        # fan-out — not a crash (ThreadPoolExecutor rejects 0).
        pool = ThreadPoolExecutor(max_workers=max(1, self.num_workers))
        stop = threading.Event()

        # archive-backed datasets expose batched raw reads (native
        # thread-pooled pread — data/native.py); decode still fans out
        # over the thread pool
        blob_mode = (hasattr(self.dataset, "read_blobs")
                     and hasattr(self.dataset, "decode"))

        # full-native path: tar-backed JPEG dataset + a host transform
        # the C++ pipeline expresses (RandomResizedCrop / center-crop,
        # no autoaugment/multicrop/duplicates) → one GIL-free
        # pread+decode+crop+resize call per batch (native/jpegdec.cpp);
        # per-sample PIL fallback for undecodable members.
        spec = getattr(self.transform, "native_spec", None)
        native_mode = native_files_mode = False
        import os as _os
        native_enabled = _os.environ.get(
            "CONVNET_TPU_NATIVE_DECODE", "1") != "0"
        if (spec is not None and native_enabled
                and (dup == 1 or spec["kind"] == "rrc")):
            # duplicates (batch augmentation): the C++ pipeline draws K
            # independent crops per DECODE, amortizing the expensive
            # decode across the copies; eval-side duplicate handling
            # (multicrop TTA) stays on the PIL path.
            from convnet_tpu.data import native as _native
            if (hasattr(self.dataset, "tar_path")
                    and hasattr(self.dataset, "offsets")):
                native_mode = _native.jpeg_available()
            elif hasattr(self.dataset, "samples"):
                # ImageFolder: read loose files on the host thread,
                # decode+crop in C++; the occasional non-JPEG member
                # (png/bmp) fails libjpeg and takes the per-sample PIL
                # fallback. Folders that are NOT mostly JPEG stay on
                # the threaded PIL path (otherwise every sample would
                # funnel through the single-threaded fallback loop).
                # Probe evenly across the (class-sorted) listing so the
                # decision spans all classes and is stable across
                # epochs/shuffle/processes.
                n_samp = len(self.dataset.samples)
                probe_idx = np.unique(np.linspace(
                    0, n_samp - 1, num=min(16, n_samp)).astype(int))
                probe = [self.dataset.samples[int(i)][0].lower()
                         for i in probe_idx]
                mostly_jpeg = len(probe) > 0 and (
                    sum(p.endswith((".jpg", ".jpeg")) for p in probe)
                    >= max(1, len(probe) * 3 // 4))
                native_files_mode = (_native.jpeg_available()
                                     and mostly_jpeg)

        def _native_spec_kwargs(b):
            # shared decode parameters for both native entry points.
            # process_index is in the seed: the C++ RNG keys per-sample
            # draws by BATCH-LOCAL position, so without it every host
            # of a multi-host run would draw the identical crop stream
            # (the PIL path decorrelates via the global dataset index).
            return dict(
                train=(spec["kind"] == "rrc"),
                out_size=spec["out_size"],
                scale_size=spec.get("scale_size", 0),
                seed=hash((self.seed, self.epoch, b, self.process_index))
                     & (2 ** 63 - 1),
                scale=spec.get("scale", (0.08, 1.0)),
                ratio=spec.get("ratio", (3 / 4, 4 / 3)),
                duplicates=dup,
                # CONVNET_TPU_FAST_DCT=1: train-path decode at reduced
                # libjpeg DCT scale (1.3-1.5× on large sources, same
                # crop boxes, slightly different resampling taps). Off
                # by default — opt-in because outputs are not bit-equal
                # to the PIL geometry; the C side ignores it for eval.
                fast_dct=_os.environ.get(
                    "CONVNET_TPU_FAST_DCT", "0") == "1",
                threads=max(1, self.num_workers))

        def _pil_rng(i, d):
            # deterministic per-(sample, duplicate) PIL fallback draw —
            # seed scheme shared by both native paths
            import random as _random
            rng = _random.Random(
                hash((self.seed, self.epoch, int(i), d)) & 0x7FFFFFFF)
            return rng

        def _finish_native(idx, labels, decoded):
            """Common tail for both native paths: full-batch PIL
            fallback when the decode call is unavailable, per-sample
            PIL repair of failed members, label duplication."""
            ys = np.asarray(np.repeat(labels, dup), np.int32)
            if decoded is None:
                # source became unreadable (moved/fd exhaustion) —
                # decode every sample through the PIL path (one decode
                # per sample, reused across duplicate draws)
                rows = []
                for i in idx:
                    sample, _ = self.dataset[int(i)]
                    rows.extend(self.transform.host(sample, _pil_rng(i, d), d)
                                for d in range(dup))
                return np.stack(rows), ys
            xs, fail = decoded
            if fail.any():
                for j in np.nonzero(fail)[0]:
                    i = int(idx[int(j)])
                    sample, _ = self.dataset[i]
                    for d in range(dup):
                        xs[int(j) * dup + d] = self.transform.host(
                            sample, _pil_rng(i, d), d)
            return xs, ys

        def native_batch(b, idx):
            from convnet_tpu.data import native as _native
            idx = np.asarray(idx, np.int64)
            decoded = _native.decode_batch(
                self.dataset.tar_path,
                self.dataset.offsets[idx], self.dataset.sizes[idx],
                **_native_spec_kwargs(b))
            return _finish_native(idx, self.dataset.labels[idx], decoded)

        def native_files_batch(b, idx):
            from convnet_tpu.data import native as _native
            idx = [int(i) for i in idx]
            labels = [self.dataset.samples[i][1] for i in idx]

            def _read(i):
                with open(self.dataset.samples[i][0], "rb") as f:
                    return f.read()

            # fan file reads over the worker pool — on high-latency
            # storage (NFS/GCS-fuse) serial open()/read() of a 256-image
            # batch would dominate the batch time before decode starts
            blobs = list(pool.map(_read, idx))
            decoded = _native.decode_blobs(blobs, **_native_spec_kwargs(b))
            return _finish_native(idx, labels, decoded)

        # IO/decode overlap: a dedicated reader thread keeps a bounded
        # queue of raw-blob batches ahead of the decoder, so archive
        # pread (GIL-free in the native pool) for batch k+1 runs while
        # batch k decodes — the role the reference's multi-worker
        # DataLoader fills with processes
        blob_q: "queue.Queue" = queue.Queue(maxsize=2)

        def read_ahead():
            try:
                for b in range(num_batches):
                    if stop.is_set():
                        return
                    idx = shard[b * self.batch_size:(b + 1) * self.batch_size]
                    unique = list(dict.fromkeys(int(i) for i in idx))
                    blob_q.put((idx, dict(zip(
                        unique, self.dataset.read_blobs(unique)))))
                blob_q.put(None)
            except Exception as e:
                blob_q.put(e)

        if blob_mode and not native_mode:
            threading.Thread(target=read_ahead, daemon=True).start()

        def assemble():
            try:
                for b in range(num_batches):
                    if stop.is_set():
                        return
                    if native_mode or native_files_mode:
                        idx = shard[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        fn = (native_batch if native_mode
                              else native_files_batch)
                        out_q.put(fn(b, idx))
                        continue
                    if blob_mode:
                        item = blob_q.get()
                        if isinstance(item, Exception):
                            raise item
                        idx, blobs = item
                        labels = self.dataset.labels
                        tasks = [
                            (blobs[int(i)], int(labels[int(i)]),
                             hash((self.seed, self.epoch, int(i), d))
                             & 0x7FFFFFFF, d)
                            for i in idx for d in range(dup)]
                        results = list(pool.map(self._decode_blob, tasks))
                    else:
                        idx = shard[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        tasks = [
                            (int(i),
                             hash((self.seed, self.epoch, int(i), d))
                             & 0x7FFFFFFF, d)
                            for i in idx for d in range(dup)]
                        results = list(pool.map(self._load_sample, tasks))
                    xs = np.stack([r[0] for r in results])
                    ys = np.asarray([r[1] for r in results], np.int32)
                    out_q.put((xs, ys))
                out_q.put(None)
            except Exception as e:  # surface loader errors to consumer
                out_q.put(e)

        thread = threading.Thread(target=assemble, daemon=True)
        thread.start()
        key = jax.random.PRNGKey(np.uint32([self.seed, self.epoch]).sum())
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                xs, ys = item
                if self.device_transform:
                    key, k = jax.random.split(key)
                    xs = self.transform.device(k, jnp.asarray(xs))
                yield xs, ys
        finally:
            stop.set()
            pool.shutdown(wait=False)
