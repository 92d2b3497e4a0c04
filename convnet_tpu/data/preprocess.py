"""Transform zoo: host (PIL, per-sample) + device (batched, jitted).

Rebuild of preprocess.py:~1–330 (approx., SURVEY.md §2.2). The split is
TPU-native: per-sample decode-time geometry (random-resized-crop,
scale+center-crop, AutoAugment) runs on the host; everything batchable
— pad+random-crop, flips, cutout, normalize, PCA lighting — runs
**batched on the accelerator** with per-sample PRNG (data/transforms.py).

``get_transform(...)`` mirrors the reference dispatch and returns a
``Transform`` with:
- ``.host(sample, rng) -> np.uint8 HWC`` fixed-size array (may be
  identity for array datasets like CIFAR);
- ``.device(key, batch) -> float32 batch`` (jit-compiled per shape);
- ``.duplicates`` — batch-augmentation factor (each sample expanded to
  K differently-augmented copies, preprocess.py duplicate wrapper).
"""

from __future__ import annotations

import dataclasses
import random
from functools import partial
from typing import Callable, Optional

import jax
import numpy as np

from convnet_tpu.data import transforms as T

# preprocess.py:~10–20 dataset statistics
DATASET_STATS = {
    "imagenet": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]},
    "cifar10": {"mean": [0.491, 0.482, 0.447], "std": [0.247, 0.243, 0.262]},
    "cifar100": {"mean": [0.507, 0.487, 0.441], "std": [0.267, 0.256, 0.276]},
    "mnist": {"mean": [0.1307], "std": [0.3081]},
    "stl10": {"mean": [0.447, 0.440, 0.407], "std": [0.260, 0.257, 0.271]},
    "svhn": {"mean": [0.438, 0.444, 0.473], "std": [0.198, 0.201, 0.197]},
}

# AlexNet-lineage PCA lighting (preprocess.py Lighting constants)
IMAGENET_PCA = {
    "eigval": [0.2175, 0.0188, 0.0045],
    "eigvec": [[-0.5675, 0.7192, 0.4009],
               [-0.5808, -0.0045, -0.8140],
               [-0.5836, -0.6948, 0.4203]],
}


@dataclasses.dataclass
class Transform:
    host: Callable        # (sample, random.Random) -> np.uint8 HWC
    device: Callable      # (key, uint8 batch) -> float32 batch (jitted)
    input_size: int
    duplicates: int = 1
    # When the host transform is expressible by the native C++ decode
    # pipeline (native/jpegdec.cpp), its parameters: {"kind": "rrc"|
    # "center", "out_size": int, "scale_size": int, "scale": (lo, hi),
    # "ratio": (lo, hi)}. None → PIL path only (autoaugment, multicrop,
    # array datasets).
    native_spec: dict = None

    def __post_init__(self):
        self.device = jax.jit(self.device)


def _identity_host(sample, rng, dup=0):
    return np.asarray(sample)


def _pil_of(sample):
    from PIL import Image
    if isinstance(sample, np.ndarray):
        return Image.fromarray(sample)
    return sample.convert("RGB")


def inception_host(sample, rng: random.Random, dup=0, out_size=224,
                   scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                   autoaugment_policy=None):
    """RandomResizedCrop on the host at decode time
    (preprocess.py inception_preproccess — upstream sic)."""
    from PIL import Image
    img = _pil_of(sample)
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        bw = int(round(np.sqrt(target * aspect)))
        bh = int(round(np.sqrt(target / aspect)))
        if bw <= w and bh <= h:
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            img = img.resize((out_size, out_size), Image.BILINEAR,
                             box=(x0, y0, x0 + bw, y0 + bh))
            break
    else:  # fallback: center crop
        img = scale_center(img, out_size)
    if autoaugment_policy is not None:
        img = autoaugment_policy(img, rng)
    return np.asarray(img, np.uint8)


def scale_center(img, out_size, scale_size=None):
    """Resize shortest side to ``scale_size`` then center-crop
    (preprocess.py scale_crop)."""
    from PIL import Image
    scale_size = scale_size or int(out_size * 256 / 224)
    w, h = img.size
    if w < h:
        nw, nh = scale_size, int(h * scale_size / w)
    else:
        nw, nh = int(w * scale_size / h), scale_size
    img = img.resize((nw, nh), Image.BILINEAR)
    x0 = (nw - out_size) // 2
    y0 = (nh - out_size) // 2
    return img.crop((x0, y0, x0 + out_size, y0 + out_size))


def scale_crop_host(sample, rng, dup=0, out_size=224, scale_size=None):
    img = _pil_of(sample)
    return np.asarray(scale_center(img, out_size, scale_size), np.uint8)


def multicrop_host(sample, rng, dup=0, out_size=224, scale_size=None):
    """Deterministic multi-crop TTA (preprocess.py multi-crop wrapper):
    duplicate d selects center/4-corner crops (+ mirrored for d ≥ 5).
    Pair with ``duplicates=k`` and eval output averaging."""
    from PIL import Image
    img = _pil_of(sample)
    scale_size = scale_size or int(out_size * 256 / 224)
    w, h = img.size
    if w < h:
        nw, nh = scale_size, int(h * scale_size / w)
    else:
        nw, nh = int(w * scale_size / h), scale_size
    img = img.resize((nw, nh), Image.BILINEAR)
    variant = dup % 10
    if variant >= 5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        variant -= 5
    positions = [
        ((nw - out_size) // 2, (nh - out_size) // 2),   # center
        (0, 0), (nw - out_size, 0),                     # corners
        (0, nh - out_size), (nw - out_size, nh - out_size),
    ]
    x0, y0 = positions[variant]
    return np.asarray(img.crop((x0, y0, x0 + out_size, y0 + out_size)),
                      np.uint8)


def default_image_size(dataset: str) -> int:
    """The eval-geometry default per dataset — ONE definition shared by
    the training transforms below and the serving path (serve.Predictor
    input_size inference), so the two cannot drift."""
    name = str(dataset).lower()
    if name in ("cifar10", "cifar100", "svhn", "stl10", "mnist"):
        return {"stl10": 96, "mnist": 28}.get(name, 32)
    return 224


def get_transform(transform_name: str = "imagenet",
                  input_size: Optional[int] = None,
                  scale_size: Optional[int] = None,
                  augment: bool = True,
                  cutout: Optional[dict] = None,
                  autoaugment: bool = False,
                  duplicates: int = 1,
                  lighting: bool = False,
                  multicrop: bool = False,
                  normalize=None) -> Transform:
    """Reference-compatible dispatch (preprocess.py get_transform:~240–330)."""
    name = transform_name.lower()
    stats = normalize or DATASET_STATS.get(
        name, DATASET_STATS["imagenet"])
    mean, std = stats["mean"], stats["std"]

    if not augment and duplicates > 1 and not multicrop:
        # Reference TTA duplicates are DIFFERENT augmentations; the
        # deterministic eval transform would average K identical logits
        # (pure waste). For PIL-path datasets, upgrade to deterministic
        # multi-crop TTA; array datasets (identity host) can only warn.
        import logging
        if name in ("cifar10", "cifar100", "svhn", "stl10", "mnist"):
            logging.getLogger(__name__).warning(
                "eval duplicates=%d on %s average IDENTICAL copies "
                "(deterministic transform, no multicrop) — this burns "
                "compute without TTA benefit", duplicates, name)
        else:
            logging.getLogger(__name__).warning(
                "eval duplicates=%d without --multicrop would average "
                "identical copies — enabling deterministic multi-crop "
                "TTA (center/corner crops + mirrors)", duplicates)
            multicrop = True

    if name in ("cifar10", "cifar100", "svhn", "stl10", "mnist"):
        size = input_size or default_image_size(name)
        pad = max(size // 8, 4)

        def device_fn(key, batch):
            x = T.to_float(batch)
            if x.shape[1] != size or x.shape[2] != size:
                # progressive-resizing regimes (Mix & Match): bring the
                # native-resolution batch to the scheduled input size
                x = T.resize(x, size)
            if augment:
                k1, k2, k3 = jax.random.split(key, 3)
                if name != "mnist":
                    x = T.random_hflip(k1, x)
                x = T.pad_random_crop(k2, x, pad)
                if cutout:
                    x = T.cutout(k3, x, cutout.get("length", size // 2),
                                 cutout.get("holes", 1))
            x = T.normalize(x, mean, std)
            return x

        host = _identity_host
        if autoaugment and augment and name.startswith("cifar"):
            from convnet_tpu.data.autoaugment import CIFAR10Policy
            policy = CIFAR10Policy()

            def host(sample, rng, dup=0):  # noqa: F811 — intentional override
                return np.asarray(policy(_pil_of(np.asarray(sample)), rng),
                                  np.uint8)

        return Transform(host, device_fn, size, duplicates)

    # imagenet-style
    size = input_size or default_image_size(name)
    native_spec = None
    if augment:
        policy = None
        if autoaugment:
            from convnet_tpu.data.autoaugment import ImageNetPolicy
            policy = ImageNetPolicy()
        host = partial(inception_host, out_size=size,
                       autoaugment_policy=policy)
        if policy is None:
            native_spec = {"kind": "rrc", "out_size": size,
                           "scale_size": 0, "scale": (0.08, 1.0),
                           "ratio": (3 / 4, 4 / 3)}

        def device_fn(key, batch):
            x = T.to_float(batch)
            k1, k2, k3 = jax.random.split(key, 3)
            x = T.random_hflip(k1, x)
            if lighting:
                x = T.lighting(k2, x, 0.1, IMAGENET_PCA["eigval"],
                               IMAGENET_PCA["eigvec"])
            if cutout:
                x = T.cutout(k3, x, cutout.get("length", size // 4),
                             cutout.get("holes", 1))
            x = T.normalize(x, mean, std)
            return x
    else:
        host_fn = multicrop_host if (multicrop and duplicates > 1) else scale_crop_host
        host = partial(host_fn, out_size=size, scale_size=scale_size)
        if (host_fn is scale_crop_host
                and not (scale_size and scale_size < size)):
            # scale_size < out_size makes PIL's crop pad the borders
            # black — a case the C++ box-resampler doesn't reproduce
            # (it clamps taps to the image); such configs stay on PIL
            native_spec = {"kind": "center", "out_size": size,
                           "scale_size": scale_size or 0}

        def device_fn(key, batch):
            return T.normalize(T.to_float(batch), mean, std)

    return Transform(host, device_fn, size, duplicates,
                     native_spec=native_spec)
