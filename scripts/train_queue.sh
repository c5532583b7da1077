#!/bin/bash
# Sequential training queue for all benchmark configs (one TPU chip).
# Usage: bash scripts/train_queue.sh [start_index]
# Flagships first (mnist nz4 trained separately), then the sweep fill-ins.
set -u
cd "$(dirname "$0")/.."
START=${1:-0}
i=0
run() {
  if [ "$i" -ge "$START" ]; then
    echo "=== [$i] train $* ==="
    python -m bitswap_tpu.train "$@" || echo "RUN FAILED: $*"
  fi
  i=$((i+1))
}
run --dataset cifar        --nz 4 --batch 128 --epochs 60  --synthetic-n 20000 --eval-every 10
run --dataset imagenetcrop --nz 4 --batch 128 --epochs 60  --synthetic-n 20000 --eval-every 10
run --dataset mnist        --nz 2 --batch 128 --epochs 60  --synthetic-n 20000 --eval-every 10
run --dataset mnist        --nz 8 --batch 128 --epochs 60  --synthetic-n 20000 --eval-every 10
run --dataset cifar        --nz 2 --batch 128 --epochs 40  --synthetic-n 20000 --eval-every 10
run --dataset cifar        --nz 8 --batch 128 --epochs 40  --synthetic-n 20000 --eval-every 10
run --dataset imagenet     --nz 2 --batch 128 --epochs 40  --synthetic-n 20000 --eval-every 10
run --dataset imagenet     --nz 4 --batch 128 --epochs 40  --synthetic-n 20000 --eval-every 10
echo "=== queue done ==="
