#!/bin/bash
# ViLT smoke (reference unitest/vilt.sh:1-11): both datasets.
set -e
cd "$(dirname "$0")/.."
export DATA_DIR=${DATA_DIR:-/tmp/mmu_unitest_data}
export MMU_PLATFORM=${MMU_PLATFORM:-cpu}
mkdir -p unitest/out unitest/error
[ -d "$DATA_DIR/hateful-meme-dataset" ] || python tools/make_synthetic_dataset.py --root "$DATA_DIR"

for dataset in hateful-meme-dataset food101; do
  python train.py --framework vilt --dataset $dataset --tiny \
    --save_path /tmp/mmu_unitest/vilt_$dataset \
    --sample_size 32 --n_epochs 1 --batch_size 4 --lr 3e-5 \
    --gradient_accumulation_steps 2 \
    --vocab_file $DATA_DIR/food101/vocab.txt \
    > unitest/out/vilt_$dataset.txt 2> unitest/error/vilt_$dataset.txt
done
echo "vilt smoke OK"
