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

# serving CLI on trained checkpoints (fp32+uncertainty, int8, clstoken)
name="flava_food101_MultiHead"
python predict.py \
  --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt \
  --dataset food101 --phase test --model_type MultiHead --batch_size 8 \
  --uncertainty --out /tmp/mmu_unitest/$name/predictions.csv \
  > unitest/out/predict_flava.txt 2> unitest/error/predict_flava.txt
python predict.py \
  --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt \
  --dataset food101 --phase test --model_type MultiHead --batch_size 8 \
  --quantize int8_weight --out /tmp/mmu_unitest/$name/predictions_q.csv \
  >> unitest/out/predict_flava.txt 2>> unitest/error/predict_flava.txt
name="flava_food101_MultiHead_clstoken"
python predict.py \
  --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt \
  --dataset food101 --phase test --model_type MultiHead --clstoken \
  --batch_size 8 --out /tmp/mmu_unitest/$name/predictions.csv \
  >> unitest/out/predict_flava.txt 2>> unitest/error/predict_flava.txt

# AOT export (jax.export artifact: StableHLO + weights, symbolic batch)
name="flava_food101_MultiHead"
python predict.py \
  --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt \
  --dataset food101 --model_type MultiHead \
  --export /tmp/mmu_unitest/$name/artifact --export_txt_len 64 \
  > unitest/out/export_flava.txt 2> unitest/error/export_flava.txt
test -f /tmp/mmu_unitest/$name/artifact/fn.stablehlo

# fixed-batch kernel-path export (CPU: plumbing only — the Pallas bake is
# a TPU no-op here; meta must record the contract)
python predict.py \
  --checkpoint_path /tmp/mmu_unitest/$name/model_best_val.pt \
  --dataset food101 --model_type MultiHead \
  --export /tmp/mmu_unitest/$name/artifact_fixed --export_txt_len 64 \
  --export_fixed_batch 4 \
  > unitest/out/export_flava_fixed.txt 2> unitest/error/export_flava_fixed.txt
test -f /tmp/mmu_unitest/$name/artifact_fixed/fn.stablehlo
grep -q '"fixed_batch": 4' /tmp/mmu_unitest/$name/artifact_fixed/meta.json

# sequence parallelism through the CLI: ring attention over a
# data=2 x seq=2 virtual mesh (collate pads img+txt to 128*2 shards)
name="flava_hm_seqparallel"
XLA_FLAGS="--xla_force_host_platform_device_count=4" python train.py \
  --framework flava --dataset hateful-meme-dataset \
  --model_type MIMO-shuffle-instance --save_path /tmp/mmu_unitest/$name \
  --sample_size 32 --n_epochs 1 --batch_size 8 --lr 1e-3 \
  --data_parallel 2 --sequence_parallel 2 \
  --multimodal_num_attention_heads 6 --multimodal_num_hidden_layers 1 \
  > unitest/out/$name.txt 2> unitest/error/$name.txt
test -f /tmp/mmu_unitest/$name/history.csv

# (temperature-scaling calibration is smoked in unitest/fashionmnist.sh
# on the eval_prediction_saving dumps)
echo "flava smoke matrix OK"
