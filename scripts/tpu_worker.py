"""Persistent TPU job worker.

Holds the axon TPU grant for the whole session and executes job files
from scripts/jobs/queue/ in-process, avoiding the 5-25 min device-grant
cool-down between separate TPU processes (see .claude/skills/verify).

Protocol:
  - Drop ``NNN_name.py`` into scripts/jobs/queue/.  Jobs are executed
    in filename order, each in a fresh module namespace but sharing the
    live JAX process (compile cache + device grant persist).
  - stdout/stderr and exceptions are captured to
    scripts/jobs/done/NNN_name.out; the job file is moved to done/.
  - A job can signal worker shutdown by creating scripts/jobs/STOP.
  - Each job gets globals: ``log(msg)`` (appends to its .out live),
    ``jax``, ``jnp``, ``np``, ``fetch1``, ``timeit``.

Run:  nohup python scripts/tpu_worker.py > scripts/jobs/worker.log 2>&1 &
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

BASE = "/root/repo/scripts/jobs"
QUEUE = os.path.join(BASE, "queue")
DONE = os.path.join(BASE, "done")
STOP = os.path.join(BASE, "STOP")
os.makedirs(QUEUE, exist_ok=True)
os.makedirs(DONE, exist_ok=True)

# operator-level CONVNET_TPU_* flags exported before launch; the per-job
# env purge restores these instead of clearing the namespace to empty
_ENV_AT_LAUNCH = {k: v for k, v in os.environ.items()
                  if k.startswith("CONVNET_TPU_")}

import jax
import jax.numpy as jnp
import numpy as np


def fetch1(out):
    """Synchronize by fetching ONE element (axon relay discipline).

    The slice must happen ON DEVICE (`.ravel()[0]` on the jax array)
    BEFORE the host fetch — np.asarray(device_array) ships the whole
    buffer over the ~67 MB/s relay (a [256,56,56,480] bf16 gradient is
    771 MB ≈ 11.5 s, the bug behind job 015's garbage timings)."""
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    if hasattr(x, "ravel"):
        x = x.ravel()[0]
    return float(x)


def make_timeit():
    def timeit(fn, *args, k=20, warmup=2):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        fetch1(out)
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        fetch1(out)
        return (time.perf_counter() - t0) / k * 1e3
    return timeit


def run_job(path):
    name = os.path.basename(path)
    outpath = os.path.join(DONE, name[:-3] + ".out")
    outf = open(outpath, "a")

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(f"{name}: {line}", flush=True)
        outf.write(line + "\n")
        outf.flush()

    # Always execute against the CURRENT repo code: the worker process
    # is long-lived, and module caching made jobs 014-023 run with the
    # convnet_tpu tree as it stood at the FIRST job's import — A/B
    # arms compared stale code against itself. Purge before each job.
    for mod in list(sys.modules):
        if mod.startswith("convnet_tpu") or mod == "bench":
            del sys.modules[mod]
    # A crashing job must not leak its env toggles into the next one
    # (job 033 left CONVNET_TPU_POOL_BWD=pallas set, breaking job 034)
    # — but flags exported at worker LAUNCH are operator-level defaults
    # (e.g. a session-wide CONVNET_TPU_NATIVE_DECODE=0 A/B arm) and must
    # survive: restore the startup snapshot instead of clearing to empty.
    for key in list(os.environ):
        if key.startswith("CONVNET_TPU_"):
            del os.environ[key]
    os.environ.update(_ENV_AT_LAUNCH)

    src = open(path).read()
    ns = {
        "__name__": "__tpu_job__",
        "__file__": path,
        "log": log,
        "jax": jax,
        "jnp": jnp,
        "np": np,
        "fetch1": fetch1,
        "timeit": make_timeit(),
    }
    t0 = time.perf_counter()
    try:
        exec(compile(src, path, "exec"), ns)
        log(f"JOB OK ({time.perf_counter() - t0:.1f}s)")
    except Exception:
        log("JOB FAILED:\n" + traceback.format_exc())
    finally:
        outf.close()
        os.replace(path, os.path.join(DONE, name))


def main():
    # The axon backend intermittently fails init with UNAVAILABLE after
    # a long grant wait (provider-side flake, observed r3 sessions 2-3).
    # Failed init IS retryable in-process — loop with a pause instead
    # of dying, so the queue survives the flake.
    for attempt in range(60):
        try:
            print(f"worker starting; devices={jax.devices()}", flush=True)
            break
        except RuntimeError as e:
            print(f"backend init failed (attempt {attempt}): {e}; "
                  "retrying in 60s", flush=True)
            time.sleep(60)
    else:
        raise SystemExit("worker giving up: backend init failed 60 times")
    # Touch the device once so the grant is held from the start.
    print(f"sanity {float(jnp.ones((2, 2)).sum())}", flush=True)
    print("worker ready", flush=True)
    while True:
        if os.path.exists(STOP):
            os.remove(STOP)
            print("worker stopping (STOP file)", flush=True)
            return
        jobs = sorted(
            f for f in os.listdir(QUEUE)
            if f.endswith(".py") and not f.startswith(".")
        )
        if not jobs:
            time.sleep(2.0)
            continue
        run_job(os.path.join(QUEUE, jobs[0]))


if __name__ == "__main__":
    main()
