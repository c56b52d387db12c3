"""Stream binning: global duplicate-and-sort tile assignment.

The TPU analogue of the CUDA reference's `duplicateWithKeys` + radix-sort
binning (SURVEY §2.10 inferred internals): every visible Gaussian emits one
entry per covered tile, all entries are sorted once by (tile, depth) with the
packed per-Gaussian render attributes carried as sort payloads, and the
compositor walks each tile's contiguous segment of the sorted stream.

Why this beats the padded-container design (render/raster.py bin_cells /
bin_tiles):
- XLA's variadic sort is HBM-bandwidth-cheap (measured ~0.1 ms for a 1M-row
  17-column lex sort on one v5e chip), while per-container top_k/sort over
  padded capacities costs tens of ms at Neu3D scale;
- carrying the packed rows through the sort removes BOTH the [T*K]-row pack
  gather (~9 ms, the former second-largest slice) and any per-entry payload
  gather: tier-1 payloads are whole-column repeats (bandwidth-only), tier-2/3
  gather only the few thousand largest Gaussians;
- total work scales with the ACTUAL number of (Gaussian, tile) pairs
  (mean ~3.2 per visible Gaussian at bench scale), not num_tiles * capacity.

Tile coverage is emitted in static tiers so shapes stay XLA-static: every
visible Gaussian gets 2x2 slots; all Gaussians spanning more (capacity
`t2_count`) get the rest of a `t2_span`^2 rect; those spanning more than that
(capacity `t3_count`) get the rest of a `t3_span`^2 rect. `stream_overflow`
reports any Gaussian exceeding a tier capacity or t3_span (0 on every
measured workload; raise the settings for pathological scenes).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

PW = 16  # sublane-padded packed-row height shared with ops/tile_composite


def build_stream(
    settings,
    prep: Dict[str, jnp.ndarray],
    features: jnp.ndarray,       # [N, L]
    *,
    t2_span: int = 4,
    t2_count: int = 16384,
    t3_span: int = 16,
    t3_count: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (rows [16, M] f32, starts [T+1] i32, n_valid [] i32).

    Row layout (HDR=8 convention of ops/tile_composite):
    [pix_x, pix_y, conic0, conic1, conic2, ln_op, 0, 0,
     r, g, b, feat_0..L-1, depth, pad...]; column-sorted by (tile, depth).
    """
    prep = jax.lax.stop_gradient(prep)
    features = jax.lax.stop_gradient(features)
    n = prep["depth"].shape[0]
    num_tiles = settings.num_tiles
    tiles_x = settings.tiles_x

    rmin = prep["rect_min"].astype(jnp.int32)
    rmax = prep["rect_max"].astype(jnp.int32)
    vis = prep["visible"]
    depth = prep["depth"]
    span_x = rmax[:, 0] - rmin[:, 0]
    span_y = rmax[:, 1] - rmin[:, 1]

    ln_op = jnp.log(jnp.maximum(prep["opacity"], 1e-30))
    # payload columns [n_pay, N] (depth is a sort key and re-emitted as the
    # last feature row afterwards, so it is not carried as a payload)
    cols = jnp.stack([
        prep["point_image"][:, 0], prep["point_image"][:, 1],
        prep["conic"][:, 0], prep["conic"][:, 1], prep["conic"][:, 2],
        ln_op,
        prep["colors"][:, 0], prep["colors"][:, 1], prep["colors"][:, 2],
        *[features[:, i] for i in range(features.shape[1])],
    ], axis=0)
    n_pay = cols.shape[0]

    tiles_parts, deps_parts = [], []
    pay_parts = [[] for _ in range(n_pay)]

    def emit(r0x, r0y, r1x, r1y, d, active, tier_cols, slots):
        for dx, dy in slots:
            tx = r0x + dx
            ty = r0y + dy
            ok = active & (tx < r1x) & (ty < r1y)
            tiles_parts.append(jnp.where(ok, ty * tiles_x + tx, num_tiles))
            deps_parts.append(d)
            for i in range(n_pay):
                pay_parts[i].append(tier_cols[i])

    # tier 1: 2x2 for every visible Gaussian — payloads are whole-column
    # repeats, no gather
    t1_slots = [(dx, dy) for dy in range(2) for dx in range(2)]
    emit(rmin[:, 0], rmin[:, 1], rmax[:, 0], rmax[:, 1], depth, vis,
         [cols[i] for i in range(n_pay)], t1_slots)

    # tier 2: Gaussians spanning beyond 2x2 (all of them, capacity
    # permitting) get the rest of a t2_span^2 rect; only these few thousand
    # rows are gathered
    big2 = vis & ((span_x > 2) | (span_y > 2))
    area2 = jnp.where(big2, span_x * span_y, -1)
    _, idx2 = jax.lax.top_k(area2, min(t2_count, n))
    sel2 = area2[idx2] > 0
    cols2 = cols[:, idx2]
    t2_slots = [(dx, dy) for dy in range(t2_span) for dx in range(t2_span)
                if not (dx < 2 and dy < 2)]
    emit(rmin[idx2, 0], rmin[idx2, 1], rmax[idx2, 0], rmax[idx2, 1],
         depth[idx2], sel2, [cols2[i] for i in range(n_pay)], t2_slots)

    # tier 3: spans beyond t2_span get the rest of a t3_span^2 rect
    big3 = vis & ((span_x > t2_span) | (span_y > t2_span))
    area3 = jnp.where(big3, span_x * span_y, -1)
    _, idx3 = jax.lax.top_k(area3, min(t3_count, n))
    sel3 = area3[idx3] > 0
    cols3 = cols[:, idx3]
    t3_slots = [(dx, dy) for dy in range(t3_span) for dx in range(t3_span)
                if not (dx < t2_span and dy < t2_span)]
    emit(rmin[idx3, 0], rmin[idx3, 1], rmax[idx3, 0], rmax[idx3, 1],
         depth[idx3], sel3, [cols3[i] for i in range(n_pay)], t3_slots)

    tile_all = jnp.concatenate(tiles_parts)
    dep_all = jnp.concatenate(deps_parts)
    pays = tuple(jnp.concatenate(p) for p in pay_parts)

    # ONE global lex sort carrying all payload columns (payload-carrying
    # sorts measure ~= key-only sorts on TPU)
    sorted_all = jax.lax.sort((tile_all, dep_all) + pays, num_keys=2)
    s_tile, s_dep = sorted_all[0], sorted_all[1]
    m = s_tile.shape[0]

    rows = jnp.zeros((PW, m), jnp.float32)
    for i in range(6):                      # header: pix, conic, ln_op
        rows = rows.at[i].set(sorted_all[2 + i])
    for i in range(n_pay - 6):              # features: rgb + lang
        rows = rows.at[8 + i].set(sorted_all[8 + i])
    rows = rows.at[8 + n_pay - 6].set(s_dep)   # depth feature row

    starts = jnp.searchsorted(
        s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    return rows, starts, starts[num_tiles]


def stream_overflow(settings, prep, *, t2_span: int = 4,
                    t2_count: int = 16384, t3_span: int = 16,
                    t3_count: int = 512) -> Dict[str, jnp.ndarray]:
    """Diagnostics: Gaussians whose tile rect exceeds the static tier
    capacities (clipped by build_stream). All zeros on measured workloads."""
    rmin = prep["rect_min"].astype(jnp.int32)
    rmax = prep["rect_max"].astype(jnp.int32)
    vis = prep["visible"]
    sx = rmax[:, 0] - rmin[:, 0]
    sy = rmax[:, 1] - rmin[:, 1]
    big2 = vis & ((sx > 2) | (sy > 2))
    big3 = vis & ((sx > t2_span) | (sy > t2_span))
    huge = vis & ((sx > t3_span) | (sy > t3_span))
    return {
        "t2_needed": big2.sum(),          # must be <= t2_count
        "t3_needed": big3.sum(),          # must be <= t3_count
        "t3_span_exceeded": huge.sum(),   # must be 0 for exactness
    }
