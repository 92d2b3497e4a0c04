"""Job 081: CLI user-surface smoke for inception_resnet_v2 — one
synthetic-data epoch on the real chip (verify recipe 1)."""
import sys
sys.argv = ["main.py", "--model", "inception_resnet_v2",
            "--dataset", "synthetic_imagenet", "-b", "64",
            "--epochs", "1", "--print-freq", "8", "--dtype", "bf16",
            "--workers", "0", "--results-dir", "/tmp/vr_irv2",
            "--save", "run1"]
from convnet_tpu.cli.main import main
main()
log("CLI smoke OK")
