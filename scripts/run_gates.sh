#!/bin/bash
# Tiered test gates (budgets + recorded wall times: ROUND5.md).
#
#   scripts/run_gates.sh fast      # commit gate      (<5 min, 1 core)
#   scripts/run_gates.sh slow      # pre-push gate    (slow tier only)
#   scripts/run_gates.sh nightly   # release gate     (k=10 paired trainings)
#   scripts/run_gates.sh all       # everything, tier by tier, timed
#
# All tiers are CPU-hermetic (tests/conftest.py pins jax to an 8-device
# virtual CPU mesh); safe to run while the TPU worker holds the chip.
set -e
cd "$(dirname "$0")/.."
tier="${1:-fast}"
run() { echo "== $1 tier =="; time python -m pytest tests/ -q -m "$2"; }
case "$tier" in
  fast)    run fast "not slow" ;;
  slow)    run slow "slow and not nightly" ;;
  nightly) run nightly "nightly" ;;
  all)     run fast "not slow"; run slow "slow and not nightly"; run nightly "nightly" ;;
  *) echo "usage: $0 [fast|slow|nightly|all]" >&2; exit 2 ;;
esac
