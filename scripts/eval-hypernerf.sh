#!/bin/bash
# Open-vocabulary localization eval (reference eval-hypernerf.sh).
set -e
EXPNAME=${1:?usage: eval-hypernerf.sh <expname> <iterations> <annotation_folder> <ae_ckpt>}
ITER=${2:?}
ANNOT=${3:?}
AE=${4:?}
python eval.py --exp_name "$EXPNAME" --iterations "$ITER" \
    --annotation_folder "$ANNOT" --ae_ckpt_path "$AE" \
    --dataset_type hypernerf --detail_results
