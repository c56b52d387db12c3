"""Synthesizes a tiny HyperNeRF(nerfies)-format scene on disk, with cached
language-feature files, for end-to-end train/render/eval smoke tests."""
import json
import os

import numpy as np

from langsplat4d.data.readers import store_ply


def make_nerfies_scene(root, n_imgs=8, hw=64, n_points=120, lang_dim=3,
                       n_segments=5, seed=0):
    """Creates dataset.json/metadata.json/scene.json/camera/*.json, rgb/2x
    images, points3D_downsample2.ply and language_features/ *_s.npy,*_f.npy.

    Layout per scene/hyper_loader.py:37-105 and scene/cameras.py:69-118.
    ratio=0.5 -> images in rgb/2x at hw x hw with camera image_size 2*hw.
    """
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    ids = [f"{i:06d}" for i in range(n_imgs)]
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump({"ids": ids, "val_ids": [], "train_ids": ids}, f)
    meta = {iid: {"camera_id": 0, "warp_id": int(i), "appearance_id": 0}
            for i, iid in enumerate(ids)}
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "scene.json"), "w") as f:
        json.dump({"near": 0.1, "far": 10.0, "scale": 1.0,
                   "center": [0.0, 0.0, 0.0]}, f)

    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb", "2x"), exist_ok=True)
    focal = 2.0 * hw  # full-res focal
    for i, iid in enumerate(ids):
        angle = 0.15 * (i - n_imgs / 2)
        # camera orbiting the origin at radius 5 in the xz plane
        c = np.array([5 * np.sin(angle), 0.0, -5 * np.cos(angle)])
        # orientation: world->camera rotation (nerfies stores orientation
        # such that R = orientation.T is the COLMAP-convention rotation)
        z = -c / np.linalg.norm(c)          # camera looks at origin
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z])         # rows
        cam = {
            "orientation": R_w2c.tolist(),
            "position": c.tolist(),
            "focal_length": focal,
            "principal_point": [hw, hw],
            "skew": 0.0, "pixel_aspect_ratio": 1.0,
            "radial_distortion": [0, 0, 0],
            "tangential_distortion": [0, 0],
            "image_size": [2 * hw, 2 * hw],
        }
        with open(os.path.join(root, "camera", f"{iid}.json"), "w") as f:
            json.dump(cam, f)
        img = rng.uniform(0, 1, size=(hw, hw, 3))
        # paint a moving blob so time matters
        yy, xx = np.mgrid[0:hw, 0:hw]
        cx = hw / 2 + 10 * np.sin(2 * np.pi * i / n_imgs)
        blob = np.exp(-((xx - cx) ** 2 + (yy - hw / 2) ** 2) / 50.0)
        img = 0.5 * img + 0.5 * blob[..., None]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "rgb", "2x", f"{iid}.png"))

    pts = rng.uniform(-1.2, 1.2, size=(n_points, 3))
    cols = rng.uniform(0, 255, size=(n_points, 3))
    store_ply(os.path.join(root, "points3D_downsample2.ply"), pts, cols)

    # language features: per-image 4-level seg maps + per-segment features
    lf_dir = os.path.join(root, "language_features")
    os.makedirs(lf_dir, exist_ok=True)
    feats = rng.normal(size=(n_segments, lang_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    # ids referenced by cameras: train real_id = colmap_id*4+1,
    # test real_id = colmap_id*4+3, video real_id = colmap_id+1
    # (scene/cameras.py:71-77). Cover everything up to 4*n_imgs+3.
    for rid in range(0, 4 * n_imgs + 4):
        seg = rng.integers(-1, n_segments, size=(4, hw, hw)).astype(np.int32)
        np.save(os.path.join(lf_dir, f"{rid:06d}_s.npy"), seg)
        np.save(os.path.join(lf_dir, f"{rid:06d}_f.npy"), feats)
    return root
