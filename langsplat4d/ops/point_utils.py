"""Point growing utilities (reference utils/point_utils.py:9-147 +
GaussianModel.grow, scene/gaussian_model.py:630-713).

The reference's `grow()` path is gated off by default (`opt.add_point=False`,
arguments/__init__.py:164) and its imports are commented out, so the torch
version would NameError if enabled (SURVEY §1 dead-code note). Here the same
capability is provided working: voxel downsample, KNN low-density detection,
perturbation-based upsampling — numpy/JAX, no open3d/torch_cluster deps.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from langsplat4d.ops.knn import mean_knn_dist2


def downsample_point_cloud(points: np.ndarray,
                           voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample: indices of one representative point per voxel."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return np.sort(idx)


def find_point_indices(points: np.ndarray, subset: np.ndarray) -> np.ndarray:
    """Indices in `points` of rows that appear in `subset`."""
    pview = points.view([("", points.dtype)] * points.shape[1]).ravel()
    sview = subset.view([("", subset.dtype)] * subset.shape[1]).ravel()
    return np.nonzero(np.isin(pview, sview))[0]


def addpoint(point_cloud: np.ndarray, density_threshold: float,
             displacement_scale: float, iter_pass: int = 0,
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Detect low-density points and propose perturbed new points.

    Returns (all_points, low_density_points, new_points, low_density_mask) —
    reference utils/point_utils.py addpoint semantics: points whose mean
    3-NN squared distance exceeds the threshold get a perturbed copy.
    """
    d2 = np.asarray(mean_knn_dist2(point_cloud.astype(np.float32)))
    low_density_mask = d2 > density_threshold
    low = point_cloud[low_density_mask]
    rng = np.random.default_rng(iter_pass)
    new_points = low + rng.normal(scale=displacement_scale, size=low.shape)
    return point_cloud, low, new_points, low_density_mask


def grow_points(points: np.ndarray, density_threshold: float = 20,
                displacement_scale: float = 20, voxel_size: float = 8,
                max_downsampled: int = 1000):
    """GaussianModel.grow host-side logic: downsample until <= max points,
    find low-density candidates, return a global selection mask."""
    down_idx = downsample_point_cloud(points, voxel_size)
    while len(down_idx) > max_downsampled:
        voxel_size += 8
        down_idx = downsample_point_cloud(points, voxel_size)
    _, low, new_points, low_mask = addpoint(points[down_idx],
                                            density_threshold,
                                            displacement_scale)
    global_mask = np.zeros(len(points), bool)
    global_mask[down_idx] = low_mask
    return global_mask, new_points
