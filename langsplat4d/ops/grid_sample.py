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
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    # Pack all 4 bilinear corners into one table row so each point needs a
    # single flat row gather (TPU gathers are row-count-bound). The +1
    # neighbors clamp at the border, matching padding_mode='border':
    # row (y0*W + x0) of the packed table holds [v00 | v01 | v10 | v11].
    xs = jnp.concatenate([plane[:, :, 1:], plane[:, :, -1:]], axis=2)
    pair_x = jnp.concatenate([plane, xs], axis=0)           # [2C, H, W]
    ys = jnp.concatenate([pair_x[:, 1:, :], pair_x[:, -1:, :]], axis=1)
    table = jnp.concatenate([pair_x, ys], axis=0)           # [4C, H, W]
    table = table.reshape(4 * C, H * W).T                   # [H*W, 4C]

    rows = table[y0 * W + x0]                               # [n, 4C]
    v00 = rows[:, 0 * C:1 * C]
    v01 = rows[:, 1 * C:2 * C]
    v10 = rows[:, 2 * C:3 * C]
    v11 = rows[:, 3 * C:4 * C]

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy   # [n, C]
