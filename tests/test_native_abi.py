"""Source↔binary ABI integrity for the native runtime.

Guards against the round-4 failure mode: the C side of an exported
signature changes, the ctypes wrapper doesn't, and the committed .so
(built from some older source) keeps the suite green while any rebuild
— including native.py's automatic `make` — produces a library that
misreads its arguments and corrupts the heap.

Two permanent defenses, both tested here:

1. An ABI-version handshake: each .so exports ctpu_*_abi_version();
   the wrapper refuses to call a library whose version differs from
   its own constant (convnet_tpu/data/native.py _JPEGDEC_ABI).
2. A from-source rebuild test: copy the committed .cpp + Makefile to a
   temp dir, `make`, and run a real decode against the FRESH binary in
   a subprocess (so an ABI break segfaults the child, not the suite).

Reference parity note: the upstream repo has no native runtime — its
DataLoader workers are torch processes (data.py:~200-260 approx.);
this file guards the TPU-side replacement's build system.
"""

import ctypes
import os
import shutil
import subprocess
import sys
import textwrap

import pytest

from convnet_tpu.data import native

NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native"))

_toolchain = shutil.which("make") and shutil.which(
    os.environ.get("CXX", "g++"))


def _abi_of(lib_path, symbol):
    lib = ctypes.CDLL(lib_path)
    fn = getattr(lib, symbol)
    fn.restype = ctypes.c_int64
    fn.argtypes = []
    return int(fn())


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE_DIR, "libconvnet_jpegdec.so")),
    reason="committed jpegdec .so absent")
def test_committed_jpegdec_matches_wrapper_abi():
    got = _abi_of(os.path.join(NATIVE_DIR, "libconvnet_jpegdec.so"),
                  "ctpu_jpegdec_abi_version")
    assert got == native._JPEGDEC_ABI, (
        "committed libconvnet_jpegdec.so was built from a different "
        "ABI than data/native.py expects — rebuild and re-commit it")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE_DIR, "libconvnet_dataio.so")),
    reason="committed dataio .so absent")
def test_committed_dataio_matches_wrapper_abi():
    got = _abi_of(os.path.join(NATIVE_DIR, "libconvnet_dataio.so"),
                  "ctpu_dataio_abi_version")
    assert got == native._DATAIO_ABI


def test_wrapper_refuses_mismatched_abi(monkeypatch, tmp_path, caplog):
    """A library reporting the wrong version must never be called."""
    if not os.path.exists(os.path.join(NATIVE_DIR,
                                       "libconvnet_jpegdec.so")):
        pytest.skip("no committed .so to load")
    lib = ctypes.CDLL(os.path.join(NATIVE_DIR, "libconvnet_jpegdec.so"))
    assert native._abi_ok(lib, "ctpu_jpegdec_abi_version",
                          native._JPEGDEC_ABI, "x") is True
    assert native._abi_ok(lib, "ctpu_jpegdec_abi_version",
                          native._JPEGDEC_ABI + 1, "x") is False
    assert native._abi_ok(lib, "ctpu_no_such_symbol", 1, "x") is False


@pytest.mark.skipif(not _toolchain, reason="no C++ toolchain")
def test_fresh_build_decodes(tmp_path):
    """`make clean && make` from the committed sources must yield
    binaries the committed Python wrapper can actually drive. Runs the
    decode in a subprocess so a signature drift (segfault) fails the
    test instead of killing the test runner."""
    build = tmp_path / "native"
    build.mkdir()
    for f in ("Makefile", "dataio.cpp", "jpegdec.cpp"):
        shutil.copy(os.path.join(NATIVE_DIR, f), build / f)
    subprocess.run(["make", "-C", str(build)], check=True,
                   capture_output=True, timeout=180)

    script = textwrap.dedent("""
        import os, sys
        import numpy as np
        import convnet_tpu.data.native as native
        build = sys.argv[1]
        # point the wrapper at the fresh build before first load
        native._NATIVE_DIR = build
        native._LIB_PATH = os.path.join(build, "libconvnet_dataio.so")
        native._JPEG_LIB_PATH = os.path.join(
            build, "libconvnet_jpegdec.so")
        if not native.jpeg_available():
            print("SKIP: libjpeg unavailable")
            sys.exit(0)
        import io
        from PIL import Image
        rng = np.random.default_rng(0)
        blobs = []
        for i in range(4):
            img = (rng.random((80 + 8 * i, 96, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=90)
            blobs.append(buf.getvalue())
        for train in (False, True):
            for fast_dct in (False, True):
                r = native.decode_blobs(blobs, train=train, out_size=48,
                                        scale_size=64, seed=7,
                                        fast_dct=fast_dct, threads=2)
                assert r is not None, "decode unavailable"
                out, fail = r
                assert out.shape == (4, 48, 48, 3)
                assert not fail.any()
                assert out.std() > 1.0  # not zero-filled
        print("FRESH_BUILD_OK")
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", script, str(build)],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(NATIVE_DIR), env=env)
    assert proc.returncode == 0, (
        f"fresh-build decode crashed (rc={proc.returncode}):\n"
        f"{proc.stdout}\n{proc.stderr}")
    assert ("FRESH_BUILD_OK" in proc.stdout
            or "SKIP" in proc.stdout), proc.stdout


@pytest.mark.skipif(not native.jpeg_available(),
                    reason="native jpegdec unavailable")
def test_fast_dct_valid_and_distinct():
    """fast_dct must produce valid crops on the train path; on large
    sources the reduced-DCT decode resamples differently, so outputs
    are close but not byte-identical to the full-scale decode. The
    eval path ignores the flag entirely (bit-equal)."""
    import io
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(3)
    # large source so the M/8 scale actually drops below 8/8
    img = (rng.random((512, 640, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    blobs = [buf.getvalue()] * 3

    slow = native.decode_blobs(blobs, train=True, out_size=64, seed=11,
                               threads=2)
    fast = native.decode_blobs(blobs, train=True, out_size=64, seed=11,
                               fast_dct=True, threads=2)
    assert slow is not None and fast is not None
    (xs, fs), (xf, ff) = slow, fast
    assert not fs.any() and not ff.any()
    assert xs.shape == xf.shape == (3, 64, 64, 3)
    # same crop boxes → strongly correlated content, modest pixel error
    err = np.abs(xs.astype(np.int16) - xf.astype(np.int16)).mean()
    assert err < 32.0, f"fast_dct crop drifted: mean abs err {err}"

    ev_slow = native.decode_blobs(blobs, train=False, out_size=64,
                                  scale_size=96, threads=2)
    ev_fast = native.decode_blobs(blobs, train=False, out_size=64,
                                  scale_size=96, fast_dct=True, threads=2)
    assert np.array_equal(ev_slow[0], ev_fast[0])


def test_abi_refusal_is_memoized(monkeypatch, caplog):
    """A refused library must be refused ONCE per process — not
    re-CDLLed (dlopen returns the stale mapping anyway) and re-warned
    on every loader batch."""
    import logging

    import convnet_tpu.data.native as native

    if not os.path.exists(os.path.join(NATIVE_DIR,
                                       "libconvnet_jpegdec.so")):
        pytest.skip("no committed .so to load")
    monkeypatch.setattr(native, "_jpeg_lib", None)
    monkeypatch.setattr(native, "_jpeg_refused", False)
    monkeypatch.setattr(native, "_jpeg_build_attempted", True)
    monkeypatch.setattr(native, "_JPEGDEC_ABI", 10 ** 6)  # force mismatch
    with caplog.at_level(logging.WARNING):
        assert native._load_jpeg() is None
        assert native._load_jpeg() is None  # memoized: no second load
    refusals = [r for r in caplog.records if "refusing" in r.message]
    assert len(refusals) == 1
