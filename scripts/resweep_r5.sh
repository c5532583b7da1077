#!/bin/bash
# Round-5 resweep: re-run the 100x100 sweeps for the retrained deep
# configs and the new nz=1 configs with the wide-lane harness
# (chunks=10 -> 1000 lanes, ~10x fewer scan steps), then regenerate the
# CMA plots and the results table.
set -u
cd "$(dirname "$0")/.."
LOG=runs/sweeps_r5.log
# the nz=8 checkpoints were retrained this round: their cached
# discretization bins are stale and MUST rebuild from the new params
rm -f bins/mnist_nz8_qb10.npz bins/cifar_nz8_qb10.npz
{
  python scripts/run_sweeps.py --only mnist1,cifar1,mnist8,cifar8 --chunks 10
  rc=$?
  echo "=== sweeps rc=$rc ==="
  for cfg in "mnist 1" "cifar 1" "mnist 8" "cifar 8"; do
    set -- $cfg
    python -m bitswap_tpu.plots.cma --dataset "$1" --nz "$2"
  done
} >> "$LOG" 2>&1
tail -30 "$LOG"
