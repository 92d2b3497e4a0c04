"""Job 153 (round 5, final tree): pre-confirm the driver's end-of-round bench on the
real chip — run bench.main() in-process and log its one JSON line, so
BENCH_r05's expected value is known before the driver runs it.
"""
import contextlib
import io

import bench

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
log(buf.getvalue().strip())
