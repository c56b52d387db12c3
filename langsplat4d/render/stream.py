"""Stream binning: global duplicate-and-sort tile assignment.

The TPU analogue of the CUDA reference's `duplicateWithKeys` + radix-sort
binning (SURVEY §2.10 inferred internals): every visible Gaussian emits one
entry per covered tile, all entries are sorted once by (tile, depth) with the
packed per-Gaussian render attributes carried as sort payloads, and the
compositor walks each tile's contiguous segment of the sorted stream.

Why this beats the padded-container design (render/raster.py bin_cells /
bin_tiles):
- ONE global variadic sort (cost ~linear in emitted slots x columns,
  measured ~0.6 ns/element on one v5e chip) replaces the per-container
  top_k/sort cascade over padded capacities (~24 ms/frame at Neu3D scale);
- carrying the packed rows through the sort removes BOTH the [T*K]-row pack
  gather (~9 ms, the former second-largest slice) and any per-entry payload
  gather: tier-1 payloads are whole-column repeats (bandwidth-only), tier-2/3
  gather only the few thousand largest Gaussians;
- total work scales with the ACTUAL number of (Gaussian, tile) pairs
  (mean ~3.2 per visible Gaussian at bench scale), not num_tiles * capacity.

Tile coverage is emitted in static span tiers so shapes stay XLA-static:
every visible Gaussian gets 2x2 slots; each configured tier (span, count)
gives the `count` largest Gaussians spanning beyond the previous tier the
remaining slots of its span^2 rect. Sort cost is linear in total emitted
slots, so tiers should hug the scene's span distribution; `stream_overflow`
reports per-tier demand and any Gaussian beyond the last span (0 on every
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
    tiers: Tuple[Tuple[int, int], ...] = ((3, 32768), (6, 4096), (16, 256)),
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

    import numpy as np

    tiles_parts, deps_parts = [], []
    pay_parts = [[] for _ in range(n_pay)]

    def emit(r0x, r0y, r1x, r1y, d, active, tier_cols, slots):
        """Vectorized slot emission: one [S*B] array per column per tier
        (a python loop over slots would build hundreds of tiny concats)."""
        dxs = jnp.asarray(np.array([s[0] for s in slots], np.int32))[:, None]
        dys = jnp.asarray(np.array([s[1] for s in slots], np.int32))[:, None]
        ns = len(slots)
        tx = r0x[None, :] + dxs                       # [S, B]
        ty = r0y[None, :] + dys
        ok = active[None, :] & (tx < r1x[None, :]) & (ty < r1y[None, :])
        tiles_parts.append(
            jnp.where(ok, ty * tiles_x + tx, num_tiles).reshape(-1))
        deps_parts.append(
            jnp.broadcast_to(d[None, :], (ns, d.shape[0])).reshape(-1))
        for i in range(n_pay):
            c = tier_cols[i]
            pay_parts[i].append(
                jnp.broadcast_to(c[None, :], (ns, c.shape[0])).reshape(-1))

    # tier 1: 2x2 for every visible Gaussian — payloads are whole-column
    # repeats, no gather
    t1_slots = [(dx, dy) for dy in range(2) for dx in range(2)]
    emit(rmin[:, 0], rmin[:, 1], rmax[:, 0], rmax[:, 1], depth, vis,
         [cols[i] for i in range(n_pay)], t1_slots)

    # higher tiers: Gaussians spanning beyond the previous tier's rect
    # (capacity permitting) get the remaining slots of this tier's rect;
    # only these few thousand rows are gathered. Row-major table for the
    # tier gathers — XLA row gathers are cheap, 2-D element gathers are not.
    packed_rows = cols.T                                  # [N, n_pay]
    prev_span = 2
    for span_i, count_i in tiers:
        bigm = vis & ((span_x > prev_span) | (span_y > prev_span))
        area_i = jnp.where(bigm, span_x * span_y, -1)
        _, idx_i = jax.lax.top_k(area_i, min(count_i, n))
        sel_i = area_i[idx_i] > 0
        cols_i = packed_rows[idx_i].T
        slots_i = [(dx, dy) for dy in range(span_i) for dx in range(span_i)
                   if not (dx < prev_span and dy < prev_span)]
        emit(rmin[idx_i, 0], rmin[idx_i, 1], rmax[idx_i, 0], rmax[idx_i, 1],
             depth[idx_i], sel_i, [cols_i[i] for i in range(n_pay)], slots_i)
        prev_span = span_i

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


def stream_overflow(settings, prep, *,
                    tiers=((3, 32768), (6, 4096), (16, 256))
                    ) -> Dict[str, jnp.ndarray]:
    """Diagnostics: per-tier demand vs the static capacities (build_stream
    clips on overflow). All zeros-over-capacity on measured workloads."""
    rmin = prep["rect_min"].astype(jnp.int32)
    rmax = prep["rect_max"].astype(jnp.int32)
    vis = prep["visible"]
    sx = rmax[:, 0] - rmin[:, 0]
    sy = rmax[:, 1] - rmin[:, 1]
    out = {}
    prev = 2
    for k, (span_i, count_i) in enumerate(tiers):
        need = (vis & ((sx > prev) | (sy > prev))).sum()
        out[f"tier{k + 2}_needed"] = need        # must be <= count_i
        out[f"tier{k + 2}_capacity"] = jnp.asarray(count_i)
        prev = span_i
    out["span_exceeded"] = (vis & ((sx > prev) | (sy > prev))).sum()  # == 0
    return out
