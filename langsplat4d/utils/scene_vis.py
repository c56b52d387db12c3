"""Training visualization: GT | render | depth triptychs with stage/iter/time
labels (reference utils/scene_utils.py:11-77 render_training_image)."""
from __future__ import annotations

import os
from typing import List

import numpy as np


def to_image_u8(arr: np.ndarray) -> np.ndarray:
    """[C,H,W] float -> [H,W,3] uint8."""
    arr = np.clip(np.transpose(arr[:3], (1, 2, 0)), 0, 1)
    return (arr * 255).astype(np.uint8)


def depth_colormap(depth: np.ndarray) -> np.ndarray:
    """[1,H,W] -> [H,W,3] uint8 grayscale-normalized depth."""
    d = depth[0]
    lo, hi = float(d.min()), float(d.max())
    norm = (d - lo) / (hi - lo + 1e-9)
    g = (norm * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def render_training_image(out_dir: str, stage: str, iteration: int,
                          elapsed: float, gt: np.ndarray, render: np.ndarray,
                          depth: np.ndarray, point_count: int) -> str:
    """Writes '{stage}_{iteration}.jpg' triptych with a label strip."""
    from PIL import Image, ImageDraw
    os.makedirs(out_dir, exist_ok=True)
    panels: List[np.ndarray] = [to_image_u8(gt), to_image_u8(render),
                                depth_colormap(depth)]
    h = max(p.shape[0] for p in panels)
    w = sum(p.shape[1] for p in panels)
    canvas = np.zeros((h + 24, w, 3), np.uint8)
    x = 0
    for p in panels:
        canvas[24:24 + p.shape[0], x:x + p.shape[1]] = p
        x += p.shape[1]
    img = Image.fromarray(canvas)
    draw = ImageDraw.Draw(img)
    label = (f"stage:{stage} iter:{iteration} "
             f"time:{int(elapsed // 60):02d}:{int(elapsed % 60):02d} "
             f"points:{point_count}")
    draw.text((4, 4), label, fill=(255, 255, 255))
    path = os.path.join(out_dir, f"{stage}_{iteration}.jpg")
    img.save(path)
    return path
