#!/bin/bash
# FLAVA smoke matrix (reference unitest/flava.sh:1-28): dataset x model_type x
# {plain, --clstoken, --avg_pool}, 1 epoch, small sample. Hermetic: generates
# synthetic data if $DATA_DIR lacks the real datasets.
set -e
cd "$(dirname "$0")/.."
export DATA_DIR=${DATA_DIR:-/tmp/mmu_unitest_data}
export MMU_PLATFORM=${MMU_PLATFORM:-cpu}
mkdir -p unitest/out unitest/error
[ -d "$DATA_DIR/hateful-meme-dataset" ] || python tools/make_synthetic_dataset.py --root "$DATA_DIR"

for dataset in hateful-meme-dataset food101; do
  for model_type in Vanilla MIMO-shuffle-instance MultiHead; do
    for extra in "" "--clstoken" "--avg_pool"; do
      if [ "$model_type" == "Vanilla" ] && [ "$extra" == "--avg_pool" ]; then continue; fi
      name="flava_${dataset}_${model_type}${extra//--/_}"
      echo "=== $name"
      python train.py --framework flava --dataset $dataset \
        --model_type $model_type $extra \
        --save_path /tmp/mmu_unitest/$name \
        --sample_size 64 --n_epochs 1 --batch_size 4 --lr 1e-3 \
        > unitest/out/$name.txt 2> unitest/error/$name.txt
    done
  done
done
echo "flava smoke matrix OK"
