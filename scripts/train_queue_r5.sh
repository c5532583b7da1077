#!/bin/bash
# Round-5 training queue (VERDICT r4 tasks 2 + 8):
# - resume the UNDERTRAINED deep configs until depth pays: mnist8/cifar8
#   had 6240/3900 steps vs mnist4/cifar4's 15600/9360 (runs/*/train.jsonl),
#   which is why their rates were worse than nz=4 (opposite the reference's
#   trend, BASELINE.md); training continues at the 5e-4 lr floor
# - train the nz=1 configs (the last checkpoint-matrix hole,
#   mnist_compress.py:81-88)
# Run from the repo root.  One config at a time (one chip).
set -u
cd "$(dirname "$0")/.."
LOG=runs/train_queue_r5.log
q() {
  echo "=== train $* ===" | tee -a "$LOG"
  python -m bitswap_tpu.train "$@" --no-tensorboard >> "$LOG" 2>&1
  echo "=== rc=$? ===" | tee -a "$LOG"
}

q --dataset mnist --nz 8 --batch 128 --epochs 85 --synthetic-n 20000 \
  --eval-every 10 --resume params/mnist/nz8_ckpt.msgpack
q --dataset cifar --nz 8 --batch 128 --epochs 60 --synthetic-n 20000 \
  --eval-every 10 --resume params/cifar/nz8_ckpt.msgpack
q --dataset mnist --nz 1 --batch 128 --epochs 25 --synthetic-n 20000 \
  --eval-every 10
q --dataset cifar --nz 1 --batch 128 --epochs 20 --synthetic-n 20000 \
  --eval-every 10
echo "=== r5 queue done ===" | tee -a "$LOG"
