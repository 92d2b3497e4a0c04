"""Job 050: final round-3 on-chip validation with the final code.

1. bench.py preview (MFU fields) — the number the driver will record
2. graft entry() forward compile-check
3. quick RN50/GoogLeNet step sanity (regressions from late changes?)
"""
import os
for key in list(os.environ):
    if key.startswith("CONVNET_TPU_"):
        del os.environ[key]
import contextlib
import io
import sys
import time

sys.path.insert(0, "/root/repo")
import bench
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
for line in buf.getvalue().splitlines():
    log("BENCH " + line)

for mod in list(sys.modules):
    if mod == "__graft_entry__":
        del sys.modules[mod]
import __graft_entry__
fn, args = __graft_entry__.entry()
out = jax.jit(fn)(*args)
log(f"entry() compile+run OK: {jax.tree_util.tree_leaves(out)[0].shape}")
