"""Job 144 (round 5): drive the repo-root bench.py on the real chip to
verify the provenance-field edit (Weak r4 #8) left the driver contract
intact — one JSON line with metric/value/unit/vs_baseline leading, and
the new vs_baseline_anchor field present."""
import io
import json
import runpy
import contextlib

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    runpy.run_path("/root/repo/bench.py", run_name="__main__")
line = buf.getvalue().strip().splitlines()[-1]
rec = json.loads(line)
for k in ("metric", "value", "unit", "vs_baseline", "vs_baseline_anchor",
          "mfu", "hbm_sol"):
    assert k in rec, k
log(line)
log(f"bench OK: {rec['value']} {rec['unit']}  mfu {rec['mfu']}  "
    f"hbm_sol {rec['hbm_sol']}")
