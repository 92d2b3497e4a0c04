"""Job 083: bench.py confirmation with all session-4 changes (IRv2
registry addition, -j0 loader fix) — guards the driver's end-of-round
BENCH_r03 run."""
import io, contextlib, importlib
import bench
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
log(buf.getvalue().strip())
