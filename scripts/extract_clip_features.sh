#!/bin/bash
# CLIP segment features from cached DEVA mask stacks
# (reference extract_clip_features.sh; DEVA runs offline upstream).
set -e
SCENE=${1:?usage: extract_clip_features.sh <scene_path> <mask_dir>}
MASKS=${2:?}
python - "$SCENE" "$MASKS" <<'PY'
import glob, sys
from langsplat4d.preprocess.clip_features import (
    TransformersClipImageEncoder, process_sequence)
scene, masks = sys.argv[1], sys.argv[2]
images = sorted(glob.glob(f"{scene}/rgb/2x/*.png"))
segs = sorted(glob.glob(f"{masks}/*.npy"))
process_sequence(images, segs, f"{scene}/language_features",
                 TransformersClipImageEncoder())
PY
