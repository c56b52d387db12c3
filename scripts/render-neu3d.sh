#!/bin/bash
set -e
SCENE_PATH=${1:?usage: render-neu3d.sh <scene_path> <expname> [iteration]}
EXPNAME=${2:?}
ITER=${3:--1}
for LEVEL in 1 2 3; do
  python render.py --model_path "output/${EXPNAME}_${LEVEL}" \
      --source_path "$SCENE_PATH" --feature_level "$LEVEL" \
      --configs configs/neu3d/default.py \
      --mode lang --load_stage fine-lang --iteration "$ITER" --skip_train --skip_video
done
