"""Round-5 (VERDICT r4 #6): extend the RN20 paired-seed accuracy-parity
protocol from k=3 to k=10 seeds, tightening the resolvable bound from
~6% to ~3% (SE ~ sigma/sqrt(k)).

Runs the exact protocol of tests/test_accuracy_parity.py::
test_resnet20_top1_parity_protocol (shared init/data/batch order per
seed, compressed stepped-LR SGD, 300 steps, non-saturating 512-sample
task) for seeds 0..9 on the CPU backend (same backend as the suite, so
the k=3 published numbers compose). Writes one line per seed plus the
summary statistics PARITY.md will cite.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

OUT = "/root/repo/scripts/jobs/done/k10_parity.out"


def log(msg):
    line = time.strftime("[%H:%M:%S] ") + msg
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import numpy as np
    import torch

    import test_accuracy_parity as tap
    from convnet_tpu import models

    regime = [
        {"epoch": 0, "optimizer": "SGD", "lr": 0.1, "momentum": 0.9},
        {"step": 180, "lr": 0.01},
        {"step": 260, "lr": 0.001},
    ]
    gaps, rows = [], []
    for seed in range(10):
        t0 = time.time()
        model = models.build("resnet", dataset="cifar10", depth=20)
        tm = tap._TorchResNetCifar(20)
        acc_j, acc_t = tap._run_protocol(
            model, regime, tm,
            lambda m: torch.optim.SGD(m.parameters(), lr=0.1,
                                      momentum=0.9), seed=seed)
        gaps.append(acc_j - acc_t)
        rows.append((seed, acc_j, acc_t))
        log(f"seed {seed}: ours {acc_j*100:.2f}  torch {acc_t*100:.2f}  "
            f"gap {100*(acc_j-acc_t):+.2f}%  ({time.time()-t0:.0f}s)")
    g = np.asarray(gaps)
    mean, sd = float(g.mean()), float(g.std(ddof=1))
    se = sd / len(g) ** 0.5
    log(f"SUMMARY k={len(g)}: mean paired gap {100*mean:+.2f}% "
        f"(SD {100*sd:.2f}%, SE {100*se:.2f}%); "
        f"resolvable bound ~ |mean|+2SE = {100*(abs(mean)+2*se):.2f}%")
    log("gaps: " + " ".join(f"{100*x:+.2f}" for x in gaps))


if __name__ == "__main__":
    main()
