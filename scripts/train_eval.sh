#!/bin/bash
# Full pipeline for one scene: two-phase video-feature training + rendering
# + evaluation (mirrors the reference scripts/train_eval.sh flow, minus the
# CUDA-extension rebuilds: the language channel count is a jit parameter).
set -e
SCENE_PATH=${1:?usage: train_eval.sh <scene_path> <expname> [lang_dim]}
EXPNAME=${2:?}
LANG_DIM=${3:-6}
export language_feature_hiddendim=$LANG_DIM

# Phase A: geometry + static language features (no temporal language MLP),
# checkpoint at 10000 for the discrete resume.
python train.py --source_path "$SCENE_PATH" --expname "$EXPNAME" \
    --configs configs/hypernerf/default.py \
    --fine_lang_iterations 0 --no_dlang 0 --checkpoint_iterations 10000

# Phase B: resume into fine-lang-discrete with per-Gaussian feature centers.
use_discrete_lang_f=t python train.py --source_path "$SCENE_PATH" \
    --expname "$EXPNAME" --configs configs/hypernerf/default.py \
    --resume_from_final_stage 1 --init_from_stage fine-base \
    --start_checkpoint "output/$EXPNAME/chkpnt_fine-base_10000.pth"
