"""Bilinear 2D grid sampling (align_corners=True, border padding).

JAX equivalent of the `F.grid_sample` wrapper used by the HexPlane field
(reference scene/hexplane.py:21-46). Implemented as corner gathers + lerp so
`jax.grad` yields the exact scatter-add backward that torch's native op has —
this covers SURVEY §7 hard-part #4 (grid_sample gradient parity).
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a feature plane at normalized coordinates.

    Args:
        plane: [C, H, W] feature grid.
        coords: [n, 2] in [-1, 1]; coords[:, 0] indexes W (x), coords[:, 1]
            indexes H (y) — torch grid_sample convention.

    Returns:
        [n, C] interpolated features.
    """
    C, H, W = plane.shape
    # align_corners=True mapping; border padding clamps sample locations.
    x = jnp.clip((coords[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    # Row-major [H*W, C] layout: row gathers with flat 1-D indices are the
    # fast path on TPU (one transpose per plane per call, hoisted by XLA).
    flat = plane.reshape(C, H * W).T

    def gather(yi, xi):
        return flat[yi * W + xi]  # [n, C]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy   # [n, C]
