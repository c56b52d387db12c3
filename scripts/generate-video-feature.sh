#!/bin/bash
# Video (temporal) language features: prompts -> captions -> E5 embeddings
# (reference generate-video-feature.sh).
set -e
MASKS=${1:?usage: generate-video-feature.sh <mask_dir> <image_dir> <work_dir>}
IMAGES=${2:?}
WORK=${3:?}
python -m langsplat4d.preprocess.image_prompt --mask_dir "$MASKS" \
    --image_dir "$IMAGES" --output_dir "$WORK/prompt_images"
python -m langsplat4d.preprocess.video_captions \
    --prompt_image_dir "$WORK/prompt_images" --output_dir "$WORK/captions"
python -m langsplat4d.preprocess.video_features \
    --caption_dir "$WORK/captions" --segmentation_dir "$MASKS"
