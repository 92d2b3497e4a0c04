"""Job 018: input pipeline end-to-end ON THE CHIP (VERDICT missing #2):
CLI trainer, ResNet-50 bf16, real JPEG decode through IndexedTarDataset
+ native pread pool + threaded loader, one epoch of the 2000-image
synthetic-JPEG tar. Records data_time vs step_time from the trainer's
own meters. This container has 1 vCPU (real v5e hosts: 112), so
data_time here is a documented worst case; scripts/session_r3_loader
carries the per-core decode rate and host extrapolation."""
import sys

argv = ["main.py", "--model", "resnet", "--model-config", "{'depth': 50}",
        "--dataset", "imagenet_tar", "--datasets-dir", "/tmp/ds",
        "-b", "64", "--epochs", "1", "--dtype", "bf16",
        "--workers", "8", "--print-freq", "5",
        "--results-dir", "/tmp/r3tar", "--save", "run1"]
old = sys.argv
sys.argv = argv
try:
    from convnet_tpu.cli.main import main
    main()
finally:
    sys.argv = old

for line in open("/tmp/r3tar/run1/log.txt"):
    if "step_time" in line or "epoch" in line:
        log(line.rstrip()[:240])
