"""Job 021: run bench.py's logic in-process to preview BENCH_r03 fields
(incl. the new MFU/model_tflops) ahead of the driver's run."""
import importlib
import io
import sys
import contextlib

sys.path.insert(0, "/root/repo")
import bench
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
for line in buf.getvalue().splitlines():
    log(line)
