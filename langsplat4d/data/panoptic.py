"""PanopticSports reader (reference readPanopticSportsinfos,
scene/dataset_readers.py:543-608): per-frame camera intrinsics K + w2c from
train/test_meta.json, images under ims/, init point cloud from
init_pt_cld.npz.

Cameras carry explicit (K, w2c) — principal-point offsets enter through the
projection matrix exactly as the reference's `setup_camera`
(dataset_readers.py:491-516) builds it.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

ZNEAR, ZFAR = 0.01, 100.0


@dataclass
class PanopticCamera:
    """Camera with explicit intrinsics; duck-types HostCamera's interface."""
    width: int
    height: int
    K: np.ndarray           # [3,3]
    w2c: np.ndarray         # [4,4]
    time: float
    image_path: Optional[str]
    colmap_id: int = 0
    uid: int = 0
    cam_name: Optional[str] = None
    image_name: str = ""
    _image: Optional[np.ndarray] = None

    @property
    def image(self) -> Optional[np.ndarray]:
        if self._image is None and self.image_path is not None:
            from langsplat4d.data.readers import load_image
            self._image = load_image(self.image_path)[:3]
        return self._image

    @property
    def world_view_transform(self) -> np.ndarray:
        return self.w2c.T.astype(np.float32)

    @property
    def projection_matrix(self) -> np.ndarray:
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        w, h = self.width, self.height
        near, far = ZNEAR, ZFAR
        P = np.array([
            [2 * fx / w, 0.0, -(w - 2 * cx) / w, 0.0],
            [0.0, 2 * fy / h, -(h - 2 * cy) / h, 0.0],
            [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
            [0.0, 0.0, 1.0, 0.0],
        ], dtype=np.float32)
        return P.T

    @property
    def full_proj_transform(self) -> np.ndarray:
        return self.world_view_transform @ self.projection_matrix

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.w2c)[:3, 3].astype(np.float32)

    def camera_params(self):
        import jax.numpy as jnp
        from langsplat4d.render.raster import CameraParams
        return CameraParams(
            viewmatrix=jnp.asarray(self.world_view_transform, jnp.float32),
            projmatrix=jnp.asarray(self.full_proj_transform, jnp.float32),
            campos=jnp.asarray(self.camera_center, jnp.float32),
            tanfovx=jnp.asarray(self.width / (2 * self.K[0, 0]), jnp.float32),
            tanfovy=jnp.asarray(self.height / (2 * self.K[1, 1]),
                                jnp.float32),
        )

    def get_language_feature(self, *a, **k):
        # PanopticSports has no language-feature pipeline in the reference
        # either (scene/cameras.py:89-90 raises for unknown data types).
        return None, None


def read_panoptic_meta(datadir: str, json_path: str):
    with open(os.path.join(datadir, json_path)) as f:
        meta = json.load(f)
    w, h = meta["w"], meta["h"]
    max_time = len(meta["fn"])
    cams: List[PanopticCamera] = []
    uid = 0
    for index in range(max_time):
        time = index / max_time
        for K, w2c, fn in zip(meta["k"][index], meta["w2c"][index],
                              meta["fn"][index]):
            cams.append(PanopticCamera(
                width=w, height=h, K=np.asarray(K, np.float64),
                w2c=np.asarray(w2c, np.float64), time=time,
                image_path=os.path.join(datadir, "ims", fn),
                image_name=fn, uid=uid, colmap_id=uid))
            uid += 1
    centers = np.linalg.inv(np.asarray(meta["w2c"][0]))[:, :3, 3]
    radius = 1.1 * np.max(np.linalg.norm(
        centers - centers.mean(0)[None], axis=-1))
    return cams, max_time, radius


def read_panoptic_scene(datadir: str):
    from langsplat4d.data.readers import BasicPointCloud, SceneInfo, store_ply
    train_cams, max_time, radius = read_panoptic_meta(datadir,
                                                      "train_meta.json")
    test_cams, _, _ = read_panoptic_meta(datadir, "test_meta.json")
    data = np.load(os.path.join(datadir, "init_pt_cld.npz"))["data"]
    xyz, rgb = data[:, :3], data[:, 3:6]
    pcd = BasicPointCloud(points=xyz, colors=rgb,
                          normals=np.ones((len(xyz), 3)))
    ply_path = os.path.join(datadir, "pointd3D.ply")
    store_ply(ply_path, xyz, rgb * 255.0)
    return SceneInfo(pcd, train_cams, test_cams, test_cams,
                     {"radius": radius, "translate": np.zeros(3)},
                     ply_path, maxtime=max_time)
