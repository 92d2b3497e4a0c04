"""Job 082: CLI user-surface smoke for inception_resnet_v2 (re-run of
081 after the -j 0 loader fix; one short synthetic epoch on chip)."""
import sys
sys.argv = ["main.py", "--model", "inception_resnet_v2",
            "--dataset", "synthetic_imagenet", "-b", "64",
            "--epochs", "1", "--print-freq", "8", "--dtype", "bf16",
            "--workers", "0", "--results-dir", "/tmp/vr_irv2",
            "--save", "run2"]
from convnet_tpu.cli.main import main
main()
log("CLI smoke OK")
