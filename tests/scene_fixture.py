"""Synthesizes a tiny HyperNeRF(nerfies)-format scene on disk, with cached
language-feature files, for end-to-end train/render/eval smoke tests."""
import json
import os

import numpy as np

from langsplat4d.data.readers import store_ply


def make_structured_scene(root, n_imgs=16, hw=64, lang_dim=3, clip_dim=16,
                          seed=0, n_obj_points=600, n_bg_points=900):
    """A 3D-consistent nerfies scene with a MOVING BALL whose language
    features are spatially coherent — for real quality measurement
    (train -> render -> eval mIoU/PSNR), unlike make_nerfies_scene whose
    seg maps are random noise.

    Geometry: a lambertian-ish orange ball of radius 0.8 oscillating along x
    (center [0.4*sin(2*pi*t), 0, 0]) in front of a static gray backdrop plane
    at z=+2.5. Cameras orbit at radius 5 (same convention as
    make_nerfies_scene). GT language features: segment 0 = ball (feature
    f_obj), segment 1 = background (f_bg), constant across views/time, in a
    synthetic `clip_dim`-dimensional "CLIP" space; the on-disk
    language_features/ hold these RAW clip_dim features (per-segment table),
    to be AE-compressed to lang_dim exactly like the reference pipeline.

    Returns (root, info) where info carries f_obj/f_bg and the per-image
    ball masks for annotation building.
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
    focal = 2.0 * hw
    radius_ball = 0.8
    bg_z = 2.5
    obj_color = np.array([0.9, 0.45, 0.1])
    bg_color = np.array([0.35, 0.38, 0.42])
    masks = {}
    cam_list = []
    for i, iid in enumerate(ids):
        angle = 0.12 * (i - n_imgs / 2)
        c = np.array([5 * np.sin(angle), 0.0, -5 * np.cos(angle)])
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z])
        cam = {
            "orientation": R_w2c.tolist(), "position": c.tolist(),
            "focal_length": focal, "principal_point": [hw, hw],
            "skew": 0.0, "pixel_aspect_ratio": 1.0,
            "radial_distortion": [0, 0, 0], "tangential_distortion": [0, 0],
            "image_size": [2 * hw, 2 * hw],
        }
        with open(os.path.join(root, "camera", f"{iid}.json"), "w") as f:
            json.dump(cam, f)
        cam_list.append((R_w2c, c))

        t = i / max(1, n_imgs - 1)
        center = np.array([0.4 * np.sin(2 * np.pi * t), 0.0, 0.0])
        # render the ball + backdrop analytically at half resolution
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float64)
        # half-res intrinsics: focal/2 = hw, pp = hw/2
        dirs = np.stack([(xx - hw / 2) / hw, (yy - hw / 2) / hw,
                         np.ones_like(xx)], axis=-1)       # camera-space rays
        dirs_w = dirs @ R_w2c                               # rows => R^T dirs
        oc = c - center
        b = 2.0 * (dirs_w @ oc)
        cc = oc @ oc - radius_ball ** 2
        disc = b * b - 4.0 * (dirs_w ** 2).sum(-1) * cc
        hit = disc > 0
        img = np.tile(bg_color, (hw, hw, 1))
        # light shading for texture so PSNR is meaningful
        tq = (-b - np.sqrt(np.maximum(disc, 0.0))) / (
            2.0 * (dirs_w ** 2).sum(-1) + 1e-12)
        p_hit = c + dirs_w * tq[..., None]
        normal = (p_hit - center) / radius_ball
        light = np.clip(normal @ np.array([0.4, 0.6, -0.69]), 0, 1)
        shade = (0.45 + 0.55 * light)[..., None]
        img[hit] = (obj_color * shade[hit])
        img += rng.normal(0, 0.01, size=img.shape)
        img = np.clip(img, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "rgb", "2x", f"{iid}.png"))
        masks[i] = hit.astype(np.uint8)

    # point cloud: ball surface at t=0.5 (center x=0... use t=0 center) + wall
    sph = rng.normal(size=(n_obj_points, 3))
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    obj_pts = sph * radius_ball
    wall = np.stack([rng.uniform(-3, 3, n_bg_points),
                     rng.uniform(-3, 3, n_bg_points),
                     np.full(n_bg_points, bg_z)], axis=1)
    pts = np.concatenate([obj_pts, wall])
    cols = np.concatenate([np.tile(obj_color * 255, (n_obj_points, 1)),
                           np.tile(bg_color * 255, (n_bg_points, 1))])
    store_ply(os.path.join(root, "points3D_downsample2.ply"), pts, cols)

    # language features: seg 0 = ball, seg 1 = background, all 4 levels.
    # feature table rows are RAW clip_dim-space features (AE input).
    f_obj = rng.normal(size=clip_dim).astype(np.float32)
    f_obj /= np.linalg.norm(f_obj)
    f_bg = rng.normal(size=clip_dim).astype(np.float32)
    f_bg -= (f_bg @ f_obj) * f_obj      # orthogonal -> clean relevancy
    f_bg /= np.linalg.norm(f_bg)
    feats = np.stack([f_obj, f_bg])
    lf_dir = os.path.join(root, "language_features")
    os.makedirs(lf_dir, exist_ok=True)
    # rid -> frame mapping (scene/cameras.py:69-90 with split-local
    # colmap ids): train cam k shows frame 4k and reads rid 4k+1; test cam k
    # shows frame 4k+2 and reads rid 4k+3; video cam j shows frame j and
    # reads rid j+1. Under the i%4 split all three coincide with
    # rid = frame + 1.
    for i in range(n_imgs):
        seg1 = np.where(masks[i] > 0, 0, 1).astype(np.int32)
        seg = np.stack([seg1] * 4)
        rid = i + 1
        np.save(os.path.join(lf_dir, f"{rid:06d}_s.npy"), seg)
        np.save(os.path.join(lf_dir, f"{rid:06d}_f.npy"), feats)
    info = {"f_obj": f_obj, "f_bg": f_bg, "masks": masks,
            "clip_dim": clip_dim}
    return root, info


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
