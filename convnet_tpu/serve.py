"""Inference engine — the deployment path.

The reference's serving story is ``--evaluate`` + ``absorb_bn``
(main.py evaluate branch, SURVEY.md §3.2); this wraps it as a reusable
``Predictor``: checkpoint → BN-folded params → one jitted batched
forward (bf16 by default, Pallas fused pointwise kernels on TPU), with
automatic padding to a fixed compiled batch shape so arbitrary request
sizes never trigger recompilation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convnet_tpu import models
from convnet_tpu.core.dtypes import get_policy
from convnet_tpu.core.module import Context
from convnet_tpu.utils.absorb_bn import search_absorb_bn
from convnet_tpu.utils.checkpoint import load_checkpoint


def _is_torch_checkpoint(path) -> bool:
    """Route by file CONTENT, not suffix: a framework-native ``.npz``
    renamed to ``.pt`` must still load through ``load_checkpoint``
    (np.load), and a torch file named oddly must go to torch.load.
    Native checkpoints are numpy zips whose members end in ``.npy``;
    torch zip checkpoints carry pickled ``data.pkl`` members; legacy
    torch files are bare pickles (not zips at all)."""
    import os
    import zipfile
    p = str(path)
    if os.path.isdir(p):
        return False
    try:
        with zipfile.ZipFile(p) as zf:
            names = zf.namelist()
        if any(n.endswith(".npy") for n in names):
            return False  # numpy savez archive → native
        return True  # a zip that isn't npz → torch's zipfile format
    except zipfile.BadZipFile:
        # not a zip: torch legacy pickle, unless the suffix says npz
        return not p.endswith(".npz")


class Predictor:
    def __init__(self, model_name: Optional[str] = None,
                 model_config: Optional[dict] = None,
                 checkpoint: Optional[str] = None, dtype: str = "bf16",
                 batch_size: int = 64, absorb_bn: bool = True,
                 impl: Optional[str] = None, normalize="auto",
                 quantize: Optional[str] = None, calibration=None,
                 input_size: Optional[int] = None, devices=None):
        """``normalize``: dataset mean/std applied on-device after the
        /255 scaling — the same normalization the training pipeline
        applies (data/preprocess.py DATASET_STATS), so checkpoints
        trained with the framework's own loaders produce correct
        logits through this path. ``"auto"`` resolves the dataset name
        from the checkpoint's config (falling back to model_config /
        imagenet); pass a dataset name, a ``{"mean","std"}`` dict, or
        ``None`` to disable (inputs already normalized).

        ``quantize="int8"``: opt-in post-training int8 quantization of
        eligible pointwise convs (nn/quant.py — per-channel weight
        scales, static per-tensor activation scales). NOTE: measured
        SLOWER than bf16 at model level on this backend (the bf16 model
        is bandwidth-bound inside XLA mega-fusions; see nn/quant.py
        docstring + scripts/PERF_NOTES.md jobs 061-064) — ships for
        accuracy-tested capability on backends where the trade flips.
        ``calibration``: (N, H, W, C) uint8/float images for the range
        observation pass (same distribution as serving traffic); when
        omitted, random images of ``input_size`` are used — functional,
        but real calibration data gives tighter ranges.

        ``model_name=None``: self-describing serving — framework
        checkpoints record the model name + full model config at save
        time (cli/main.py save_checkpoint dicts), so the Predictor
        rebuilds the exact trained architecture from the checkpoint
        alone; any ``model_config`` entries given here override the
        saved ones. Mirrors the reference's resume path, which rebuilds
        from the saved config (main.py resume branch, SURVEY.md §3.2).
        Torch checkpoints don't reliably carry the factory name, so
        they still require ``model_name``.

        ``devices``: data-parallel serving over multiple chips —
        ``"all"`` (every local device), an int (first N), or an
        explicit device list. Weights are replicated and each compiled
        batch is sharded over the batch axis of a 1-D mesh; since
        inference has no cross-sample ops (eval BN uses running
        stats), XLA emits zero collectives — pure throughput scaling.
        ``batch_size`` must divide evenly across the devices. The
        reference's analog is the nn.DataParallel eval wrap
        (train.py:~25–80 approx.); here it is a sharding annotation,
        not a replicating wrapper module."""
        ckpt = None
        is_torch = bool(checkpoint) and _is_torch_checkpoint(checkpoint)
        if checkpoint and not is_torch:
            ckpt = load_checkpoint(checkpoint)
        if not model_name:
            if ckpt is None or not ckpt.get("model"):
                raise ValueError(
                    "model_name omitted: requires a framework checkpoint "
                    "that records its model (torch checkpoints and "
                    "checkpoint-free serving need an explicit model_name)")
            model_name = ckpt["model"]
            merged = dict(ckpt.get("config") or {})
            merged.update(model_config or {})
            model_config = merged
        self.model = models.build(model_name, **(model_config or {}))
        self.policy = get_policy(dtype)
        self.batch_size = batch_size
        self.impl = impl or "xla"

        if is_torch:
            # serve straight from a PyTorch reference checkpoint
            # (reference evaluate journey, main.py:~280 approx.)
            from convnet_tpu.utils.torch_import import load_torch_checkpoint
            params, state = self.model.init(jax.random.PRNGKey(0),
                                            self.policy)
            params, state, meta = load_torch_checkpoint(
                checkpoint, self.model, params, state)
            ckpt = {"config": meta.get("config", {})}
        elif ckpt is not None:
            params, state = ckpt["params"], ckpt["state"]
            params = jax.tree_util.tree_map(jnp.asarray, params)
            state = jax.tree_util.tree_map(jnp.asarray, state)
        else:
            params, state = self.model.init(jax.random.PRNGKey(0), self.policy)
        if absorb_bn:
            params, state = search_absorb_bn(params, state)

        self._mesh = None
        self._x_sharding = None
        if devices is not None:
            devs = jax.local_devices()
            if devices == "all":
                pass
            elif isinstance(devices, int):
                if not 0 < devices <= len(devs):
                    raise ValueError(
                        f"devices={devices}: this host has "
                        f"{len(devs)} local devices")
                devs = devs[:devices]
            else:
                devs = list(devices)
                if not devs:
                    raise ValueError("devices: empty device list")
            if batch_size % len(devs):
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"{len(devs)} serving devices")
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            self._mesh = Mesh(np.array(devs), ("data",))
            self._x_sharding = NamedSharding(self._mesh,
                                             PartitionSpec("data"))
            replicated = NamedSharding(self._mesh, PartitionSpec())
            put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda a: jax.device_put(jnp.asarray(a), replicated), t)
            self.params = put(params)
            self.state = put(state)
        else:
            self.params = jax.device_put(params)
            self.state = jax.device_put(state)

        from convnet_tpu.data.preprocess import (DATASET_STATS,
                                                 default_image_size)
        # explicit model_config wins over the checkpoint's recorded
        # config (when model_name was None the two are already merged
        # with the same precedence)
        dataset = (model_config or {}).get("dataset") or \
            ((ckpt or {}).get("config") or {}).get("dataset") or \
            (model_name if model_name.lower() in DATASET_STATS
             else "imagenet")
        dataset = str(dataset).lower()
        if input_size is None:
            # match the run's actual eval geometry: the checkpoint
            # records the run's explicit --input-size (cli/main.py save
            # dicts); else the model's own native size (inception
            # family: 299); else the dataset default (preprocess.py) —
            # a checkpoint trained at a non-default size must not
            # silently serve at 224
            input_size = ((ckpt or {}).get("input_size")
                          or getattr(self.model, "input_size", None)
                          or default_image_size(dataset))
        self.input_size = int(input_size)
        if normalize == "auto":
            normalize = DATASET_STATS.get(dataset,
                                          DATASET_STATS["imagenet"])
        elif isinstance(normalize, str):
            normalize = DATASET_STATS[normalize.lower()]
        if normalize is not None:
            self._mean = jnp.asarray(normalize["mean"], jnp.float32)
            self._std = jnp.asarray(normalize["std"], jnp.float32)
        else:
            self._mean = self._std = None

        model = self.model
        policy = self.policy
        mean, std = self._mean, self._std

        def prep(x):
            # uint8 inputs are scaled on-device: the host→device
            # transfer then moves 1 byte/px instead of 4 (PCIe/link
            # bandwidth is the serving bottleneck at batch size).
            # Float inputs are expected in [0, 1] (post-/255).
            if x.dtype == jnp.uint8:
                x = x.astype(policy.compute_dtype) / 255.0
            if mean is not None:
                x = (x - mean.astype(x.dtype)) / std.astype(x.dtype)
            return policy.cast_to_compute(x)

        self.act_scales = None
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"quantize={quantize!r}: only 'int8' "
                                 f"is supported")
            from convnet_tpu.nn.quant import calibrate
            calib = calibration
            if calib is None:
                calib = np.random.default_rng(0).integers(
                    0, 256, (16, input_size, input_size, 3), np.uint8)
            calib = np.asarray(calib)
            batches = [prep(jnp.asarray(calib[i:i + 32]))
                       for i in range(0, len(calib), 32)]
            self.act_scales = tuple(calibrate(
                self.model, self.params, self.state, batches,
                ctx_kwargs={"policy": policy, "impl": self.impl}))
        act_scales = self.act_scales

        @jax.jit
        def forward(params, state, x):
            quant_ctx = None
            if act_scales is not None:
                from convnet_tpu.nn.quant import QuantCtx
                quant_ctx = QuantCtx("int8", list(act_scales))
            ctx = Context(train=False, policy=policy, impl=self.impl,
                          quant=quant_ctx)
            logits, _ = model(params, state, prep(x), ctx)
            return logits.astype(jnp.float32)

        self._forward = forward

    def predict_logits(self, x) -> np.ndarray:
        """x: (N, H, W, C) float or uint8 (raw bytes are transferred and
        scaled on device); any N — batched/padded internally."""
        x = np.asarray(x)
        n = x.shape[0]
        outs = []
        for i in range(0, n, self.batch_size):
            chunk = x[i:i + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            if self._x_sharding is not None:
                chunk = jax.device_put(chunk, self._x_sharding)
            else:
                chunk = jnp.asarray(chunk)
            logits = self._forward(self.params, self.state, chunk)
            outs.append(np.asarray(logits)[:self.batch_size - pad or None])
        return np.concatenate(outs)[:n]

    def predict(self, x, topk: int = 1):
        logits = self.predict_logits(x)
        idx = np.argsort(-logits, axis=-1)[:, :topk]
        return idx if topk > 1 else idx[:, 0]

    def __call__(self, x):
        return self.predict_logits(x)

    @classmethod
    def from_checkpoint(cls, checkpoint: str, **kwargs) -> "Predictor":
        """One-line deployment from a training run: the checkpoint's
        recorded model name + config rebuild the architecture (see
        ``__init__`` model_name=None). ``checkpoint`` may be the run
        directory itself (resolves checkpoint.npz)."""
        return cls(checkpoint=checkpoint, **kwargs)

    def export(self, path: Optional[str] = None, platforms=None) -> bytes:
        """Serialize the serving function as a self-contained StableHLO
        artifact (``jax.export``): weights, normalization, and the
        uint8→compute preprocessing are baked in as constants, so the
        artifact runs anywhere a JAX/PJRT runtime exists — no model
        code, checkpoint, or this framework required at the serving
        site (load with ``convnet_tpu.serve.load_exported`` or raw
        ``jax.export.deserialize``).

        Input signature: ``(batch_size, input_size, input_size, 3)``
        uint8 (the deployment path's wire format — 1 byte/px); output:
        float32 logits. ``platforms``: lowering targets, e.g.
        ``("tpu", "cpu")`` for a cross-platform artifact (requires
        impl='xla' — Pallas kernels are backend-specific); default =
        the current backend only."""
        if self._mesh is not None:
            raise ValueError(
                "export requires a single-device Predictor (the "
                "artifact would pin the serving site to this exact "
                "device topology); build with devices=None to export")
        from jax import export as jexport
        params, state, fwd = self.params, self.state, self._forward

        def serving_fn(x):
            return fwd(params, state, x)

        spec = jax.ShapeDtypeStruct(
            (self.batch_size, self.input_size, self.input_size, 3),
            jnp.uint8)
        kwargs = {"platforms": tuple(platforms)} if platforms else {}
        exported = jexport.export(jax.jit(serving_fn), **kwargs)(spec)
        data = exported.serialize()
        if path is not None:
            with open(path, "wb") as f:
                f.write(data)
        return bytes(data)


class ExportedPredictor:
    """Serve from a ``Predictor.export`` StableHLO artifact — the
    checkpoint-free deployment endpoint. Pads/chunks arbitrary request
    sizes to the artifact's fixed compiled batch, like ``Predictor``."""

    def __init__(self, path_or_bytes):
        from jax import export as jexport
        data = path_or_bytes
        if not isinstance(data, (bytes, bytearray)):
            with open(data, "rb") as f:
                data = f.read()
        self._exported = jexport.deserialize(bytearray(data))
        spec = self._exported.in_avals[0]
        self.batch_size = int(spec.shape[0])
        self.input_size = int(spec.shape[1])
        self._call = jax.jit(self._exported.call)

    def predict_logits(self, x) -> np.ndarray:
        x = np.asarray(x, np.uint8)
        n = x.shape[0]
        outs = []
        for i in range(0, n, self.batch_size):
            chunk = x[i:i + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            logits = self._call(jnp.asarray(chunk))
            outs.append(np.asarray(logits)[:self.batch_size - pad or None])
        return np.concatenate(outs)[:n]

    def predict(self, x, topk: int = 1):
        logits = self.predict_logits(x)
        idx = np.argsort(-logits, axis=-1)[:, :topk]
        return idx if topk > 1 else idx[:, 0]

    __call__ = predict_logits


def load_exported(path_or_bytes) -> ExportedPredictor:
    return ExportedPredictor(path_or_bytes)


def _decode_jpeg_pil(blob, out_size, scale_size=None):
    # decode, then route through the SAME eval transform the training
    # pipeline tests (data/preprocess.py scale_crop_host) — serving must
    # not fork the scale/center-crop geometry
    import io
    from PIL import Image
    from convnet_tpu.data.preprocess import scale_crop_host
    img = Image.open(io.BytesIO(blob))
    return scale_crop_host(img, None, out_size=out_size,
                           scale_size=scale_size)


def predict_jpeg(predictor: Predictor, blobs, topk: int = 1,
                 input_size: Optional[int] = None, threads: int = 8):
    """Classify raw JPEG bytes end to end: native C++ decode +
    shorter-side scale + center crop (native/jpegdec.cpp, within 1 LSB
    of the PIL eval transform), then the Predictor's jitted uint8
    inference path. ``blobs``: iterable of bytes. Falls back to PIL
    per sample when the native library is unavailable or a blob fails
    to decode. ``input_size`` defaults to the predictor's configured
    size (which int8 calibration also used) — overriding it should be
    rare and deliberate."""
    import numpy as _np
    from convnet_tpu.data import native
    if input_size is None:
        input_size = predictor.input_size
    blobs = list(blobs)
    out = native.decode_blobs(blobs, train=False, out_size=input_size,
                              threads=threads)
    if out is None:
        batch = _np.stack([_decode_jpeg_pil(b, input_size) for b in blobs])
    else:
        batch, fail = out
        for j in _np.nonzero(fail)[0]:
            batch[j] = _decode_jpeg_pil(blobs[int(j)], input_size)
    return predictor.predict(batch, topk=topk)
