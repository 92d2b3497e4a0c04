"""Generate a synthetic JPEG tar for input-pipeline testing
(round-2 VERDICT missing #2: prove IndexedTarDataset + the threaded
loader can feed the chip; reference DataLoader workers,
data.py:~200-260 approx.).

Creates ``<out>.tar`` with ``<cls>/<name>.jpg`` members (class = first
path component, matching IndexedTarDataset's labeling) of
PIL-encoded RGB noise-with-structure images.

Usage: python scripts/make_synth_tar.py [out_tar] [n_images] [size]
"""
import io
import os
import sys
import tarfile
import time

import numpy as np
from PIL import Image


def main(out="/tmp/synth_imagenet.tar", n=2000, size=256, classes=20):
    rng = np.random.default_rng(0)
    t0 = time.time()
    with tarfile.open(out, "w") as tf:  # uncompressed tar, like ImageNet
        for i in range(n):
            c = i % classes
            # structured image (gradients + class-dependent pattern) so
            # JPEG sizes resemble natural images rather than pure noise
            yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
            base = np.stack([
                0.5 + 0.4 * np.sin(6.28 * (xx * (1 + c % 5) + i * 0.01)),
                0.5 + 0.4 * np.cos(6.28 * (yy * (1 + c % 3))),
                xx * 0.5 + yy * 0.5,
            ], -1)
            noise = rng.standard_normal((size, size, 3)) * 0.08
            img = np.clip((base + noise) * 255, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=90)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"cls{c:04d}/img{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if i % 500 == 0:
                print(f"{i}/{n} ({time.time()-t0:.0f}s)", flush=True)
    idx = out + ".idx.npz"
    if os.path.exists(idx):
        os.remove(idx)
    print(f"wrote {out}: {os.path.getsize(out)/1e6:.1f} MB, "
          f"{n} images in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args[:1] or ["/tmp/synth_imagenet.tar"]),
         *map(int, args[1:]))
