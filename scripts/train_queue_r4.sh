#!/bin/bash
# Round-4 fill-in queue: the remaining reference configs (VERDICT #4).
# mnist nz2/nz8 carry the depth-trend headline; cifar/imagenet fill the
# sweep table. Shorter epochs than the flagships (VERDICT allows).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
run() { echo "=== train $* ==="; timeout 2400 python -m bitswap_tpu.train "$@" || echo "RUN FAILED: $*"; }
run --dataset mnist    --nz 2 --batch 128 --epochs 40 --synthetic-n 20000 --eval-every 10
run --dataset mnist    --nz 8 --batch 128 --epochs 40 --synthetic-n 20000 --eval-every 10
run --dataset cifar    --nz 8 --batch 128 --epochs 25 --synthetic-n 20000 --eval-every 10
run --dataset cifar    --nz 2 --batch 128 --epochs 25 --synthetic-n 20000 --eval-every 10
run --dataset imagenet --nz 4 --batch 128 --epochs 25 --synthetic-n 20000 --eval-every 10
run --dataset imagenet --nz 2 --batch 128 --epochs 25 --synthetic-n 20000 --eval-every 10
echo "=== r4 queue done ==="
