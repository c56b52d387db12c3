"""CLIP feature extraction from precomputed DEVA/SAM mask stacks.

Rebuild of `preprocess/generate_clip_features.py`: for each frame, load the
4-level seg stack, crop/pad/resize each segment to 224x224, CLIP-encode the
tiles, and write per-frame `*_f.npy` (segments x 512, fp16) + `*_s.npy`
(4 x H x W int32 seg map with cross-level offset relabeling, :115-187).

The CLIP image tower is a pluggable provider (offline MLLM stage); all the
mask/segmap logic is dependency-free numpy and unit-tested.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Tuple

import numpy as np


def masks_from_stack(mask_stack: np.ndarray) -> List[List[Dict]]:
    """[4, H, W] DEVA mask stack -> per-level list of {segmentation, label,
    bbox} dicts (reference sam_encoder, :325-347). Labels are 1-based in the
    stack; bbox is (x, y, w, h) in the inclusive-extent convention."""
    all_levels = []
    for i in range(mask_stack.shape[0]):
        level = []
        for j in range(1, int(mask_stack[i].max()) + 1):
            pos = np.where(mask_stack[i] == j)
            if len(pos[0]) == 0:
                continue
            y_min, y_max = pos[0].min(), pos[0].max()
            x_min, x_max = pos[1].min(), pos[1].max()
            level.append({
                "segmentation": mask_stack[i] == j,
                "label": j,
                "bbox": [x_min, y_min, x_max - x_min, y_max - y_min],
            })
        all_levels.append(level)
    return all_levels


def get_seg_img(mask: Dict, image: np.ndarray) -> np.ndarray:
    """Black-out everything outside the segment, crop to bbox (:214-219)."""
    img = image.copy()
    img[mask["segmentation"] == 0] = np.array([0, 0, 0], dtype=np.uint8)
    x, y, w, h = np.int32(mask["bbox"])
    return img[y:y + h, x:x + w, ...]


def pad_img(img: np.ndarray) -> np.ndarray:
    """Pad to square (:221-229)."""
    h, w, _ = img.shape
    s = max(w, h)
    pad = np.zeros((s, s, 3), dtype=np.uint8)
    if h > w:
        pad[:, (h - w) // 2:(h - w) // 2 + w, :] = img
    else:
        pad[(w - h) // 2:(w - h) // 2 + h, :, :] = img
    return pad


def mask2segmap(masks: List[Dict], image: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (tiles [S,3,224,224] float in [0,1], seg_map [H,W] int32 with -1
    background), 0-based per-level ids (:356-381). Zero-area masks dropped."""
    import cv2
    seg_img_list = []
    seg_map = -np.ones(image.shape[:2], dtype=np.int32)
    masks = [m for m in masks if m["bbox"][2] != 0 and m["bbox"][3] != 0]
    for i, mask in enumerate(masks):
        seg_img = pad_img(get_seg_img(mask, image))
        seg_img_list.append(cv2.resize(seg_img, (224, 224)))
        seg_map[mask["segmentation"]] = i
    if not seg_img_list:
        return np.zeros((0, 3, 224, 224), np.float32), seg_map
    tiles = np.stack(seg_img_list).astype(np.float32) / 255.0
    return tiles.transpose(0, 3, 1, 2), seg_map


LEVEL_NAMES = ("default", "s", "m", "l")


def create_frame_features(
    image: np.ndarray,            # [H, W, 3] uint8 RGB
    mask_stack: np.ndarray,       # [4, H, W]
    encode_image: Callable[[np.ndarray], np.ndarray],  # tiles -> [S, D]
) -> Tuple[np.ndarray, np.ndarray]:
    """One frame -> (features [total_segments, D], seg_map [4, H, W]).

    Cross-level offset relabeling: level j's ids are shifted by the cumulative
    segment counts of levels < j so the flat feature table indexes all levels
    (reference create(), :155-169)."""
    levels = masks_from_stack(mask_stack)
    feats = []
    seg_maps = []
    lengths = []
    for masks in levels:
        tiles, seg_map = mask2segmap(masks, image)
        emb = (encode_image(tiles) if len(tiles)
               else np.zeros((0, 512), np.float32))
        emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        feats.append(emb)
        seg_maps.append(seg_map)
        lengths.append(len(emb))
    cumsum = np.cumsum(lengths)
    out_maps = [seg_maps[0]]
    for j in range(1, len(seg_maps)):
        v = seg_maps[j].copy()
        assert v.max() == lengths[j] - 1, (j, v.max(), lengths[j] - 1)
        v[v != -1] += cumsum[j - 1]
        out_maps.append(v)
    features = np.concatenate(feats, axis=0).astype(np.float16)
    seg_map = np.stack(out_maps, axis=0)
    assert len(features) == int(seg_map.max() + 1)
    return features, seg_map


def process_sequence(image_paths: List[str], seg_paths: List[str],
                     save_folder: str,
                     encode_image: Callable[[np.ndarray], np.ndarray]) -> None:
    """Walk aligned (image, mask-stack) lists, write *_f.npy/*_s.npy."""
    from PIL import Image
    os.makedirs(save_folder, exist_ok=True)
    for img_path, seg_path in zip(image_paths, seg_paths):
        image = np.asarray(Image.open(img_path).convert("RGB"))
        mask_stack = np.load(seg_path)
        features, seg_map = create_frame_features(image, mask_stack,
                                                  encode_image)
        stem = os.path.splitext(os.path.basename(img_path))[0]
        np.save(os.path.join(save_folder, stem + "_f.npy"), features)
        np.save(os.path.join(save_folder, stem + "_s.npy"), seg_map)


class TransformersClipImageEncoder:
    """CLIP ViT-B-16 image tower via transformers (requires a locally cached
    checkpoint; the reference uses open_clip laion2b_s34b_b88k)."""

    def __init__(self, model_name: str = "laion/CLIP-ViT-B-16-laion2B-s34b-b88k",
                 batch: int = 64):
        from transformers import CLIPModel
        self.model = CLIPModel.from_pretrained(model_name)
        self.batch = batch
        self.mean = np.array([0.48145466, 0.4578275, 0.40821073],
                             np.float32).reshape(3, 1, 1)
        self.std = np.array([0.26862954, 0.26130258, 0.27577711],
                            np.float32).reshape(3, 1, 1)

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        import torch
        out = []
        for i in range(0, len(tiles), self.batch):
            x = (tiles[i:i + self.batch] - self.mean) / self.std
            with torch.no_grad():
                f = self.model.get_image_features(
                    pixel_values=torch.from_numpy(x))
            out.append(f.numpy())
        return np.concatenate(out, axis=0)
