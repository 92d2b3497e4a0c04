"""Verify job (round 5): drive bench.py end-to-end on the real chip
after the anchor-provenance edit (vs_baseline_anchor field + docstring).
Asserts the JSON contract the driver depends on."""
import json
import subprocess
import sys

proc = subprocess.run([sys.executable, "/root/repo/bench.py"],
                      capture_output=True, text=True, timeout=1800)
line = proc.stdout.strip().splitlines()[-1]
rec = json.loads(line)
print(line)
assert rec["metric"] == "resnet50_train_images_per_sec_per_chip", rec
assert rec["value"] > 2000, rec["value"]
assert "vs_baseline_anchor" in rec and "external estimate" in rec["vs_baseline_anchor"]
assert 0.2 < rec["mfu"] < 1.0 and 0.8 < rec["hbm_sol"] < 1.1, rec
print("VERIFY OK: bench JSON contract holds, %.1f img/s mfu %.3f hbm_sol %.3f"
      % (rec["value"], rec["mfu"], rec["hbm_sol"]))
