#!/bin/bash
# Round-5 extension queue: keep training the deep configs until depth pays
# (VERDICT r4 task 2 done-condition: nz=8 net b/d <= nz=4).  The resumed
# runs train at the reference's 5e-4 lr floor; the backend trains
# mnist-class at ~55 it/s and cifar-class at ~13 it/s, so hundreds of
# epochs are minutes.
set -u
cd "$(dirname "$0")/.."
LOG=runs/train_queue_r5.log
q() {
  echo "=== train $* ===" | tee -a "$LOG"
  python -m bitswap_tpu.train "$@" --no-tensorboard >> "$LOG" 2>&1
  echo "=== rc=$? ===" | tee -a "$LOG"
}

q --dataset mnist --nz 8 --batch 128 --epochs 250 --synthetic-n 20000 \
  --eval-every 25 --resume params/mnist/nz8_ckpt.msgpack
q --dataset cifar --nz 8 --batch 128 --epochs 120 --synthetic-n 20000 \
  --eval-every 20 --resume params/cifar/nz8_ckpt.msgpack
echo "=== r5 ext queue done ===" | tee -a "$LOG"
