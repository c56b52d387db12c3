"""Camera/geometry math: view & projection matrices, quaternions, covariances.

Semantics mirror the reference:
- `utils/graphics_utils.py:31-77` (world2view / OpenGL-style projection / fov).
- `utils/general_utils.py:70-116` (build_rotation, build_scaling_rotation,
  strip_symmetric).

All matrix-building helpers are numpy (host-side, once per camera); the
per-Gaussian batched ops are JAX and jit/vmap-friendly.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side camera matrices (numpy; built once per camera)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix (reference getWorld2View2).

    R is the camera-to-world rotation (COLMAP convention: stored transposed),
    t the world->camera translation.
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.float32(np.linalg.inv(C2W))


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection (reference getProjectionMatrix)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Batched JAX geometry (per-Gaussian)
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[N,4] (w,x,y,z) quaternions -> [N,3,3] rotation matrices.

    Normalizes first (reference build_rotation, utils/general_utils.py:84-105).
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Batched Hamilton product, output normalized.

    Mirrors `utils/graphics_utils.py:109-132` (batch_quaternion_multiply).
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    q3 = jnp.stack([w, x, y, z], axis=-1)
    return q3 / jnp.linalg.norm(q3, axis=-1, keepdims=True)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s): [N,3] x [N,4] -> [N,3,3]."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_from_scaling_rotation(scaling: jnp.ndarray, scaling_modifier: float,
                                     rotation: jnp.ndarray) -> jnp.ndarray:
    """[N,6] upper-triangular 3D covariance (xx,xy,xz,yy,yz,zz).

    Mirrors GaussianModel.build_covariance_from_scaling_rotation
    (scene/gaussian_model.py:32-36).
    """
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] symmetric -> [N,6] (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-9,
                   axis: int = -1) -> jnp.ndarray:
    """x / (||x|| + eps) with a finite gradient at x = 0.

    torch's norm defines a zero subgradient at the origin, which the reference
    relies on (language features start at zero, gaussian_renderer/
    __init__.py:94); jnp.linalg.norm would produce NaN there.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-30))
    return x / (norm + eps)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-linear LR interpolation with optional delayed warmup.

    JAX port of `utils/general_utils.py:35-68` (get_expon_lr_func, from
    Plenoxels/JaxNeRF). `step` may be a traced scalar.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)
