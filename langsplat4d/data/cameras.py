"""Host-side camera with GT language-feature fetch.

Numpy rebuild of `scene/cameras.py:18-132` (Camera/MiniCam): view/projection
matrices in the transposed row-vector convention consumed by the rasterizer,
plus `get_language_feature` which gathers per-pixel features from the offline
pipeline's `*_s.npy` seg maps + `*_f.npy` feature tables (:69-118).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from langsplat4d.core.transforms import projection_matrix, world_to_view

ZNEAR, ZFAR = 0.01, 100.0


@dataclass
class HostCamera:
    colmap_id: int
    R: np.ndarray                 # [3,3]
    T: np.ndarray                 # [3]
    fovx: float
    fovy: float
    image: Optional[np.ndarray]   # [3,H,W] float32 in [0,1] (lazy ok)
    image_name: str
    uid: int
    time: float = 0.0
    mask: Optional[np.ndarray] = None
    cam_name: Optional[str] = None
    width: int = 0
    height: int = 0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    image_path: Optional[str] = None
    # lazy-decode spec: when `image` is None and `image_path` is set, the
    # `image` property decodes on first access with these load_image args.
    # Path-backed cameras whose pixels are never touched (device-GT-cache
    # hits in train/loop.build_batch) therefore cost zero host decode.
    image_resize: Optional[Tuple[int, int]] = None
    image_filt: str = "bicubic"

    def __post_init__(self):
        # masks assigned AFTER construction (hyper test split) must not be
        # baked into a later lazy decode — snapshot the construction-time
        # choice so eager and lazy normalization are identical
        self.__dict__["_mask_image"] = (
            self.mask if self.mask is not None and self.mask.ndim == 3
            else None)
        img = self.__dict__.get("_image")
        # provenance for cache keying: pixels are "file-backed" only when
        # they came (or will come) from image_path via the lazy decode and
        # were never reassigned afterwards
        self.__dict__["_image_from_ctor"] = img is not None
        self.__dict__["_image_dirty"] = False
        if img is not None:
            self.__dict__["_image"] = self._normalize(img)

    def _normalize(self, img: np.ndarray) -> np.ndarray:
        img = np.clip(img[:3], 0.0, 1.0).astype(np.float32)
        self.height, self.width = img.shape[1:]
        m = self.__dict__.get("_mask_image")
        if m is not None:
            img = img * m
        return img

    @property
    def image_materialized(self) -> bool:
        """True when pixels are already in memory (eager construction, a
        direct `cam.image = ...` assignment, or a past lazy decode)."""
        return self.__dict__.get("_image") is not None

    @property
    def image_file_backed(self) -> bool:
        """True when the pixel content is exactly the lazy decode of
        `image_path` (whether or not it has happened yet): the image was not
        constructor-supplied and was never reassigned. Cache keys may then
        use file identity instead of hashing pixels."""
        return (self.image_path is not None
                and not self.__dict__.get("_image_from_ctor", True)
                and not self.__dict__.get("_image_dirty", True))

    @property
    def world_view_transform(self) -> np.ndarray:
        return world_to_view(self.R, self.T, self.trans, self.scale).T

    @property
    def projection_matrix(self) -> np.ndarray:
        return projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy).T

    @property
    def full_proj_transform(self) -> np.ndarray:
        return self.world_view_transform @ self.projection_matrix

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.world_view_transform)[3, :3]

    def camera_params(self):
        """Device-side CameraParams for the rasterizer."""
        import jax
        import jax.numpy as jnp
        return jax.tree.map(jnp.asarray, self.camera_params_np())

    def camera_params_np(self):
        """Host-side CameraParams (numpy leaves): lets batch builders stack
        whole camera batches in numpy and pay ONE upload per field instead of
        5 device dispatches per camera (PERF.md: dispatch setup over the
        device tunnel dominates small-array uploads)."""
        from langsplat4d.render.raster import CameraParams
        return CameraParams(
            viewmatrix=np.asarray(self.world_view_transform, np.float32),
            projmatrix=np.asarray(self.full_proj_transform, np.float32),
            campos=np.asarray(self.camera_center, np.float32),
            tanfovx=np.asarray(np.tan(self.fovx * 0.5), np.float32),
            tanfovy=np.asarray(np.tan(self.fovy * 0.5), np.float32),
        )

    def get_language_feature(self, language_feature_dir: str,
                             feature_level: int, split: str = "train",
                             data_type: str = "nerfies",
                             ) -> Tuple[Optional[np.ndarray],
                                        Optional[np.ndarray]]:
        """Per-pixel GT language features + validity mask.

        Camera-id -> feature-file mapping follows scene/cameras.py:69-90
        (nerfies: colmap_id*4+1 train / *4+3 test; dynerf: cam_name-frame).
        Returns (feature [C,H,W], mask [1,H,W]) float32/bool or (None, None).
        """
        seg, feature_map = self.get_language_feature_compact(
            language_feature_dir, feature_level, split, data_type)
        if seg is None:
            return None, None
        h, w = self.height, self.width
        # multithreaded C++ gather when the native lib is built
        from langsplat4d import native
        point_feature, mask = native.gather_language_features(
            seg.astype(np.int32), feature_map)
        assert point_feature.shape[1:] == (h, w), (point_feature.shape, h, w)
        return point_feature, mask

    def get_language_feature_compact(
            self, language_feature_dir: str, feature_level: int,
            split: str = "train", data_type: str = "nerfies",
            ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """The raw on-disk GT language representation: per-pixel segment ids
        at the chosen SAM level + the per-segment feature table.

        Returns (seg [H,W] int, features [S,C] float32) or (None, None).
        This is the compact H2D wire format — the per-pixel gather happens
        on DEVICE (train/step.py materialize_batch), so ~1 MB crosses the
        host->device link instead of the ~8 MB gathered f32 map + mask that
        get_language_feature produces.
        """
        if language_feature_dir is None:
            return None, None
        if data_type == "nerfies":
            if split == "train":
                real_id = self.colmap_id * 4 + 1
            elif split == "test":
                real_id = self.colmap_id * 4 + 3
            else:  # video
                real_id = self.colmap_id + 1
            name = os.path.join(language_feature_dir, f"{real_id:06}")
        elif data_type == "dynerf":
            frame_id = self.colmap_id % 300
            if split == "test":
                assert self.colmap_id < 300
            elif split == "video":
                return None, None
            name = os.path.join(language_feature_dir,
                                f"{self.cam_name}-{frame_id:04}")
        else:
            raise NotImplementedError(data_type)

        seg_map = np.load(name + "_s.npy")          # [4,H,W] int
        feature_map = np.load(name + "_f.npy")      # [S, C]
        level = {0: 0, 1: 1, 2: 2, 3: 3}[feature_level]
        seg = seg_map[level]                         # [H,W]
        if feature_map.shape[0] < np.iinfo(np.int16).max:
            seg = seg.astype(np.int16)               # halve the wire bytes
        else:
            seg = seg.astype(np.int32)
        return seg, np.ascontiguousarray(feature_map, dtype=np.float32)


def _host_camera_image_get(self: HostCamera) -> Optional[np.ndarray]:
    img = self.__dict__.get("_image")
    if img is None and self.image_path is not None:
        from langsplat4d.data.readers import load_image
        img = self._normalize(load_image(
            self.image_path, resize=self.image_resize, filt=self.image_filt))
        self.__dict__["_image"] = img
    return img


def _host_camera_image_set(self: HostCamera, v: Optional[np.ndarray]) -> None:
    self.__dict__["_image"] = v
    self.__dict__["_image_dirty"] = True   # cleared by __post_init__ for
    #                                        the constructor's assignment


# `image` is both a dataclass field and a lazy property: the generated
# __init__'s `self.image = image` routes through the setter (raw storage),
# __post_init__ normalizes an eagerly-passed array exactly as before, and the
# getter decodes path-backed cameras on first pixel access only.
HostCamera.image = property(_host_camera_image_get, _host_camera_image_set)


@dataclass
class MiniCam:
    """GUI camera (scene/cameras.py:120-132)."""
    width: int
    height: int
    fovy: float
    fovx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray
    time: float = 0.0

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.world_view_transform)[3, :3]


def rotate_camera_around_center(camera: HostCamera, angle_degrees: float,
                                center: np.ndarray,
                                axs: str = "x") -> HostCamera:
    """Orbit a camera around the scene center (novel-view helper; reference
    scene/cameras.py:135-228). Rotates the camera position about `center` on
    the chosen world axis and re-aims the orientation by the same rotation."""
    import copy
    theta = np.deg2rad(angle_degrees)
    c, s = np.cos(theta), np.sin(theta)
    if axs == "x":
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    elif axs == "y":
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    else:
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    w2c = np.eye(4)
    w2c[:3, :3] = camera.R.T
    w2c[:3, 3] = camera.T
    c2w = np.linalg.inv(w2c)
    cam_pos = c2w[:3, 3]
    new_pos = rot @ (cam_pos - center) + center
    new_rot = rot @ c2w[:3, :3]
    new_c2w = np.eye(4)
    new_c2w[:3, :3] = new_rot
    new_c2w[:3, 3] = new_pos
    new_w2c = np.linalg.inv(new_c2w)

    out = copy.copy(camera)
    out.R = new_w2c[:3, :3].T
    out.T = new_w2c[:3, 3]
    return out
