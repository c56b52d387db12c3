#!/bin/bash
# CLIP (512->3) and video (4096->6) autoencoders (reference train_autoencoder.sh).
set -e
DATASET=${1:?usage: train_autoencoder.sh <dataset_path> <model_name> [mode=clip|video]}
NAME=${2:?}
MODE=${3:-clip}
if [ "$MODE" = "video" ]; then
  python -m langsplat4d.ae.train --dataset_path "$DATASET" --model_name "$NAME" \
      --encoder_dims 2048 1024 512 256 128 64 32 6 \
      --decoder_dims 32 64 128 256 512 1024 2048 4096 \
      --feature_dims 4096 --hidden_dims 6 --language_name video_features
  python -m langsplat4d.ae.test --dataset_path "$DATASET" --model_name "$NAME" \
      --encoder_dims 2048 1024 512 256 128 64 32 6 \
      --decoder_dims 32 64 128 256 512 1024 2048 4096 \
      --feature_dims 4096 --hidden_dims 6 --language_name video_features
else
  python -m langsplat4d.ae.train --dataset_path "$DATASET" --model_name "$NAME"
  python -m langsplat4d.ae.test --dataset_path "$DATASET" --model_name "$NAME"
fi
