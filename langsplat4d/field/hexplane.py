"""HexPlane (K-Planes) spatio-temporal feature field.

TPU-native rebuild of `scene/hexplane.py:109-185`: six learnable planes per
scale over the coordinate pairs xy,xz,xt,yz,yt,zt
(`itertools.combinations(range(4), 2)`), bilinear interpolation, per-scale
product over planes, concat over scales. Time planes initialize to 1.0 for
static/dynamic separation (scene/hexplane.py:64-65); multiscale resolution
multipliers apply to spatial dims only (scene/hexplane.py:131-134).

Quirk preserved for parity: spatial coords are AABB-normalized to [-1, 1] with
an inverted max/min convention while the time coordinate stays in [0, 1]
(reference normalize_aabb + get_density, scene/hexplane.py:19-20,160-177).
"""
from __future__ import annotations

import itertools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from langsplat4d.ops.grid_sample import grid_sample_2d

COO_COMBS = tuple(itertools.combinations(range(4), 2))  # xy,xz,xt,yz,yt,zt
# Plane-id sets follow the reference regularizers (gaussian_model.py:763-800):
# combinations(range(4), 2) orders pairs as xy,xz,xt,yz,yt,zt, so the purely
# spatial planes are ids [0,1,3] and the spatio-temporal ones [2,4,5].
TV_PLANE_IDS = (0, 1, 3)
TIME_PLANE_IDS = (2, 4, 5)


def init_hexplane(key, kplanes_config: Dict[str, Any], multires: List[int]):
    """Returns params: {'grids': [scale][plane] arrays [C, H, W], 'aabb': [2,3]}.

    Plane array layout [C, reso[c1], reso[c0]] matches the torch
    `[1, out_dim, reso[cc] for cc in coo_comb[::-1]]` (scene/hexplane.py:61-63)
    with the leading batch dim dropped.
    """
    out_dim = kplanes_config["output_coordinate_dim"]
    base_reso = kplanes_config["resolution"]
    grids = []
    for res_mult in multires:
        reso = [r * res_mult for r in base_reso[:3]] + list(base_reso[3:])
        scale_planes = []
        for comb in COO_COMBS:
            key, sub = jax.random.split(key)
            shape = (out_dim, reso[comb[1]], reso[comb[0]])
            if 3 in comb:  # time plane -> ones
                plane = jnp.ones(shape, jnp.float32)
            else:
                plane = jax.random.uniform(sub, shape, jnp.float32, 0.1, 0.5)
            scale_planes.append(plane)
        grids.append(scale_planes)
    return {"grids": grids}


def hexplane_feat_dim(kplanes_config: Dict[str, Any], multires: List[int]) -> int:
    return kplanes_config["output_coordinate_dim"] * len(multires)


def default_aabb(bounds: float) -> jnp.ndarray:
    """Reference convention: aabb[0]=max corner, aabb[1]=min corner."""
    return jnp.asarray([[bounds] * 3, [-bounds] * 3], jnp.float32)


def init_dense_grid(channels: int = 1, world_size=(64, 64, 64)) -> jnp.ndarray:
    """DenseGrid parameter (reference scene/grid.py:15-24): ones-initialized
    [C, Nx, Ny, Nz] occupancy grid (the torch [1, C, *world_size] with the
    batch dim dropped)."""
    return jnp.ones((channels, *world_size), jnp.float32)


def dense_grid_query(grid: jnp.ndarray, aabb: jnp.ndarray,
                     pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear DenseGrid sample (reference scene/grid.py:26-37).

    Matches `F.grid_sample(grid, ind_norm.flip(-1), bilinear,
    align_corners=True)` semantics: the coordinate flip in the reference makes
    world x index the grid's leading spatial axis, and the default
    padding_mode='zeros' means out-of-AABB corners contribute 0.

    grid: [C, Nx, Ny, Nz]; pts: [n, 3] world coords. Returns [n, C].
    """
    xyz_max, xyz_min = aabb[0], aabb[1]
    u = (pts - xyz_min) / (xyz_max - xyz_min)  # [n,3] in [0,1] inside aabb
    c, nx, ny, nz = grid.shape
    sizes = jnp.asarray([nx, ny, nz], jnp.float32)
    # align_corners=True: norm in [-1,1] maps linearly onto [0, N-1]
    f = u * (sizes - 1.0)
    f0 = jnp.floor(f)
    w1 = f - f0
    w0 = 1.0 - w1
    i0 = f0.astype(jnp.int32)
    i1 = i0 + 1
    flat = grid.reshape(c, -1)

    def corner(ix, iy, iz, w):
        inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
               & (iz >= 0) & (iz < nz))
        idx = (jnp.clip(ix, 0, nx - 1) * ny * nz
               + jnp.clip(iy, 0, ny - 1) * nz + jnp.clip(iz, 0, nz - 1))
        vals = flat[:, idx]                       # [C, n]
        return jnp.where(inb[None, :], vals, 0.0) * w[None, :]

    out = (corner(i0[:, 0], i0[:, 1], i0[:, 2], w0[:, 0] * w0[:, 1] * w0[:, 2])
           + corner(i1[:, 0], i0[:, 1], i0[:, 2],
                    w1[:, 0] * w0[:, 1] * w0[:, 2])
           + corner(i0[:, 0], i1[:, 1], i0[:, 2],
                    w0[:, 0] * w1[:, 1] * w0[:, 2])
           + corner(i1[:, 0], i1[:, 1], i0[:, 2],
                    w1[:, 0] * w1[:, 1] * w0[:, 2])
           + corner(i0[:, 0], i0[:, 1], i1[:, 2],
                    w0[:, 0] * w0[:, 1] * w1[:, 2])
           + corner(i1[:, 0], i0[:, 1], i1[:, 2],
                    w1[:, 0] * w0[:, 1] * w1[:, 2])
           + corner(i0[:, 0], i1[:, 1], i1[:, 2],
                    w0[:, 0] * w1[:, 1] * w1[:, 2])
           + corner(i1[:, 0], i1[:, 1], i1[:, 2],
                    w1[:, 0] * w1[:, 1] * w1[:, 2]))
    return out.T                                   # [n, C]


def normalize_aabb(pts: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    return (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


def hexplane_spatial(params, aabb: jnp.ndarray,
                     pts: jnp.ndarray) -> List[jnp.ndarray]:
    """Time-independent part of the query: per-scale product of the purely
    spatial planes (xy, xz, yz). For a fixed scene rendered at many times
    (render.py's FPS loop) this is computable once and reused per frame —
    half the plane gathers drop out of the per-frame path.

    Returns a list of [n, C] arrays, one per scale.
    """
    p = normalize_aabb(pts, aabb)
    per_scale = []
    for scale_planes in params["grids"]:
        interp = 1.0
        for ci in TV_PLANE_IDS:
            comb = COO_COMBS[ci]
            interp = interp * grid_sample_2d(scale_planes[ci],
                                             p[:, list(comb)])
        per_scale.append(interp)
    return per_scale


def hexplane_query(params, aabb: jnp.ndarray, pts: jnp.ndarray,
                   timestamps: jnp.ndarray,
                   spatial: List[jnp.ndarray] | None = None) -> jnp.ndarray:
    """Interpolate multiscale features at (xyz, t).

    Args:
        params: from init_hexplane.
        aabb: [2,3] (max, min) — stored outside params since it is not learned
            (requires_grad=False in the reference, scene/hexplane.py:120).
        pts: [n, 3] raw world coordinates.
        timestamps: [n, 1] times in [0, 1].
        spatial: optional precomputed hexplane_spatial(params, aabb, pts) —
            must correspond to the same (params, aabb, pts).

    Returns: [n, feat_dim] with feat_dim = out_dim * num_scales.
    """
    p = normalize_aabb(pts, aabb)
    p4 = jnp.concatenate([p, timestamps], axis=-1)  # [n, 4]
    if spatial is None:
        spatial = hexplane_spatial(params, aabb, pts)
    per_scale = []
    for si, scale_planes in enumerate(params["grids"]):
        interp = spatial[si]
        for ci in TIME_PLANE_IDS:
            comb = COO_COMBS[ci]
            coords = p4[:, list(comb)]  # [n, 2]; coords[:,0]->W, [:,1]->H
            interp = interp * grid_sample_2d(scale_planes[ci], coords)
        per_scale.append(interp)
    return jnp.concatenate(per_scale, axis=-1)


# ---------------------------------------------------------------------------
# Plane regularizers (reference scene/regulation.py + gaussian_model.py:763-802)
# ---------------------------------------------------------------------------

def _plane_smoothness(plane: jnp.ndarray) -> jnp.ndarray:
    """Second-difference smoothness over the H axis (axis -2).

    Mirrors `compute_plane_smoothness` (scene/regulation.py:22-28), which
    differences along dim 2 of [1,C,H,W]; for time planes H is the time axis
    (comb[::-1] puts coordinate 3 into H).
    """
    first = plane[..., 1:, :] - plane[..., :-1, :]
    second = first[..., 1:, :] - first[..., :-1, :]
    return jnp.mean(second ** 2)


def plane_tv_loss(params) -> jnp.ndarray:
    """TV smoothness over plane ids [0,1,3] (reference _plane_regulation)."""
    total = 0.0
    for scale_planes in params["grids"]:
        for gid in TV_PLANE_IDS:
            total = total + _plane_smoothness(scale_planes[gid])
    return total


def time_smoothness_loss(params) -> jnp.ndarray:
    """Smoothness on spatio-temporal planes (reference _time_regulation)."""
    total = 0.0
    for scale_planes in params["grids"]:
        for gid in TIME_PLANE_IDS:
            total = total + _plane_smoothness(scale_planes[gid])
    return total


def l1_time_planes_loss(params) -> jnp.ndarray:
    """|1 - plane| on spatio-temporal planes (reference _l1_regulation)."""
    total = 0.0
    for scale_planes in params["grids"]:
        for gid in TIME_PLANE_IDS:
            total = total + jnp.mean(jnp.abs(1.0 - scale_planes[gid]))
    return total


def compute_regulation(params, time_smoothness_weight: float,
                       l1_time_planes_weight: float,
                       plane_tv_weight: float) -> jnp.ndarray:
    """Reference GaussianModel.compute_regulation (scene/gaussian_model.py:801)."""
    return (plane_tv_weight * plane_tv_loss(params)
            + time_smoothness_weight * time_smoothness_loss(params)
            + l1_time_planes_weight * l1_time_planes_loss(params))
