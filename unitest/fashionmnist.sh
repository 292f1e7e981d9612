#!/bin/bash
# FashionMNIST MIMO smoke: all six strategies + transformer variants +
# eval scripts, on the synthetic stand-in.
set -e
cd "$(dirname "$0")/.."
export MMU_PLATFORM=${MMU_PLATFORM:-cpu}
mkdir -p unitest/out unitest/error

for model_type in Vanilla MultiHead MIMO-shuffle-instance MIMO-shuffle-view MIMO-shuffle-all single-model-weight-sharing; do
  name="fmnist_${model_type}"
  echo "=== $name"
  python train_fashionmnist.py --synthetic --model_type $model_type \
    --save_path /tmp/mmu_unitest/$name \
    --sample_size 128 --n_epochs 2 --batch_size 32 --lr 0.05 \
    > unitest/out/$name.txt 2> unitest/error/$name.txt
  python eval_prediction_saving.py --synthetic --model_type $model_type \
    --save_path /tmp/mmu_unitest/$name \
    --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt --batch_size 32 \
    >> unitest/out/$name.txt 2>> unitest/error/$name.txt
  python eval_robustness.py --synthetic --model_type $model_type \
    --save_path /tmp/mmu_unitest/$name \
    --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt --batch_size 32 \
    >> unitest/out/$name.txt 2>> unitest/error/$name.txt
done

for model_type in MultiHead MIMO-shuffle-instance; do
  name="fmnist_transformer_${model_type}"
  echo "=== $name"
  python train_fashionmnist.py --synthetic --transformer --model_type $model_type \
    --save_path /tmp/mmu_unitest/$name \
    --sample_size 64 --n_epochs 2 --batch_size 16 --lr 1e-4 \
    > unitest/out/$name.txt 2> unitest/error/$name.txt
done

# temperature-scaling calibration on the prediction dumps (MultiHead run)
name="fmnist_MultiHead"
python tools/calibrate.py \
  --val_predictions /tmp/mmu_unitest/$name/model_best_val_predictions.npy \
  --val_labels /tmp/mmu_unitest/$name/model_best_val_labels.npy \
  --reliability_csv /tmp/mmu_unitest/$name/reliability.csv \
  > unitest/out/calibrate_fmnist.txt 2> unitest/error/calibrate_fmnist.txt
test -s /tmp/mmu_unitest/$name/reliability.csv

echo "fashionmnist smoke matrix OK"
