#!/bin/bash
# MMBT smoke (reference unitest/mmbt.sh:1-7): food101, grad accumulation.
# --tiny shrinks the backbones so the smoke run fits small CI machines.
set -e
cd "$(dirname "$0")/.."
export DATA_DIR=${DATA_DIR:-/tmp/mmu_unitest_data}
export MMU_PLATFORM=${MMU_PLATFORM:-cpu}
mkdir -p unitest/out unitest/error
[ -d "$DATA_DIR/food101" ] || python tools/make_synthetic_dataset.py --root "$DATA_DIR"

TINY_FLAG=--tiny
[ -n "$MMU_FULL_SIZE" ] && TINY_FLAG=""
python train.py --framework mmbt --dataset food101 $TINY_FLAG \
  --save_path /tmp/mmu_unitest/mmbt \
  --sample_size 64 --n_epochs 1 --batch_size 4 --lr 5e-5 \
  --gradient_accumulation_steps 10 --max_seq_len 64 --n_workers 2 \
  > unitest/out/mmbt.txt 2> unitest/error/mmbt.txt
echo "mmbt smoke OK"
