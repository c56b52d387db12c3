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

RANK_BITS = 18          # depth-rank bits in the packed narrow-sort key
RANK_CAP = 1 << RANK_BITS
KEY_SENTINEL = jnp.uint32(0xFFFFFFFF)   # invalid slots sort to the end


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
    # ONE shared span-descending order replaces a top_k per rung: every
    # rung's candidate set {span > prev} is a prefix of this order, so
    # rung i takes the first count_i entries and masks the stragglers
    # (equivalent to per-rung top_k whenever capacity covers demand — the
    # autotuned case; best-effort by span instead of area otherwise).
    packed_rows = cols.T                                  # [N, n_pay]
    span_key = jnp.where(vis, jnp.maximum(span_x, span_y), -1)
    sorder = jnp.argsort(-span_key, stable=False)
    prev_span = 2
    for span_i, count_i in tiers:
        idx_i = sorder[:min(count_i, n)]
        sel_i = span_key[idx_i] > prev_span
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
    # sorts measure ~= key-only sorts on TPU). is_stable=False: (tile, depth)
    # ties can only order equal-depth splats arbitrarily, exactly like the
    # CUDA radix sort's arbitrary tie order — and the stable variant measures
    # 2-4x slower at stream sizes.
    sorted_all = jax.lax.sort((tile_all, dep_all) + pays, num_keys=2,
                              is_stable=False)
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


def _tile_min_quad(A, B, C, cx, cy, x0, x1, y0, y1):
    """Min of q(x,y) = A(x-cx)^2 + 2B(x-cx)(y-cy) + C(y-cy)^2 over the pixel
    rect [x0,x1]x[y0,y1], vectorized. Exact for PSD conics: 0 if the center
    is inside; otherwise the min lies on the boundary — evaluate the four
    clamped edge minima (1-D quadratic argmin clamped to the edge)."""
    inside = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)

    def edge_x(xe):
        dx = xe - cx
        ys = cy - B * dx / jnp.maximum(C, 1e-12)
        dy = jnp.clip(ys, y0, y1) - cy
        return A * dx * dx + 2 * B * dx * dy + C * dy * dy

    def edge_y(ye):
        dy = ye - cy
        xs = cx - B * dy / jnp.maximum(A, 1e-12)
        dx = jnp.clip(xs, x0, x1) - cx
        return A * dx * dx + 2 * B * dx * dy + C * dy * dy

    m = jnp.minimum(jnp.minimum(edge_x(x0), edge_x(x1)),
                    jnp.minimum(edge_y(y0), edge_y(y1)))
    return jnp.where(inside, 0.0, m)


def _morton_u32(tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    """Interleave two 8-bit tile coordinates into a Morton (Z-order) code:
    consecutive codes are spatially adjacent tiles, so Gaussians sorted by
    the code land near their tile-segment neighbours in the row table —
    which is what makes the budgeted row-gather cache-friendly."""
    def spread(v):
        v = v.astype(jnp.uint32) & 0xFF
        v = (v | (v << 4)) & jnp.uint32(0x0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x3333)
        v = (v | (v << 1)) & jnp.uint32(0x5555)
        return v
    return spread(tx) | (spread(ty) << 1)


def build_stream_narrow(
    settings,
    prep: Dict[str, jnp.ndarray],
    features: jnp.ndarray,       # [N, L]
    *,
    tiers: Tuple[Tuple[int, int], ...],
    budget: int,
    ellipse_cull: bool = True,
    tile_band: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Narrow-sort stream build: -> (rows [16, budget], starts [T+1], n_valid).

    `tile_band` = (ty0, band_rows) restricts the build to tile rows
    [ty0, ty0 + band_rows) — the multi-chip tile partition
    (parallel/render.py): each chip emits, sorts and gathers ONLY its
    band's slots, so sort cost scales 1/D. `band_rows` must be a static
    int (shapes); `ty0` may be traced (e.g. axis_index * band_rows under
    shard_map). Keys and `starts` are band-local (row ty -> ty - ty0).

    The classic `build_stream` carries all 12 packed attribute columns
    through the global (tile, depth) sort; at exact-coverage emission counts
    (~3-4M slots on trained-checkpoint-realistic scenes) the sort dominates
    the frame. This variant sorts TWO columns only:

      key  = tile << 18 | depth_rank   (u32; depth_rank = position in a
             pre-sorted depth order of the N Gaussians — a bijection of
             depth, so (tile, rank) lex order == (tile, depth) lex order,
             ties broken arbitrarily exactly like the CUDA radix sort)
      src  = the Gaussian's position in a Morton-reordered row table

    and materializes the packed rows afterwards with ONE budgeted row
    gather `table[src[:budget]]` — Morton ordering makes the gather's
    source rows for any tile segment nearly contiguous. Invalid slots get
    KEY_SENTINEL and sort past the budget. `ellipse_cull` additionally
    invalidates rect slots whose tile lies entirely outside the alpha >=
    1/255 ellipse (min of the conic quadratic over the tile's pixel rect
    > 2*ln(255*op)) — those entries contribute nothing in the compositor
    (same cutoff), so culling them preserves exactness bit-for-bit while
    shortening segments.

    Capacity <= 2^18 and num_tiles < 2^14 use the packed-u32 key; beyond
    that the build self-switches to the two-column wide key (capacity up
    to 2^24 — covers the reference's 360k density cap, train.py:399) at
    the cost of one extra u32 sort column.
    """
    prep = jax.lax.stop_gradient(prep)
    features = jax.lax.stop_gradient(features)
    n = prep["depth"].shape[0]
    tiles_x = settings.tiles_x
    ts = settings.tile_size
    if tile_band is None:
        ty0, band_rows = 0, settings.tiles_y
    else:
        ty0, band_rows = tile_band
    num_tiles = band_rows * tiles_x            # band-local tile count

    # single-key mode (default): the sort carries NO src column — the key's
    # rank bits index a rank-ordered table directly. Morton table order only
    # applies to the legacy 2-column mode (the permutations are exclusive).
    single_key = getattr(settings, "stream_single_key", True)
    use_morton = getattr(settings, "stream_morton", False) and not single_key
    morder, mpos = _morton_table_order(settings, prep, use_morton)

    packed = pack_attribute_table(prep, features)

    # wide mode lifts the u32 key-packing caps for >= 2^18 capacity (the
    # reference's 360k operating point) at the cost of one extra u32 sort
    # column — see _narrow_sorted_pairs
    wide = n > RANK_CAP or num_tiles >= (1 << 14)
    k_sorted, s_sorted, n_valid, dorder = _narrow_sorted_pairs(
        settings, prep, mpos, tiers=tiers, ellipse_cull=ellipse_cull,
        tile_band=tile_band, carry_src=not single_key, wide=wide)
    budget = min(int(budget), int(k_sorted.shape[0]))
    k_b = k_sorted[:budget]
    if single_key:
        # rank-ordered table: src = rank bits of the key (wide mode: the
        # sorted rank column). One N-row permutation replaces carrying src
        # through the M-slot sort, and the budget gather's indices ASCEND
        # within every tile segment (ranks are sorted within a tile), which
        # is the locality the Morton experiment paid an extra argsort for.
        # Sentinel keys index past N and clamp — excluded by `starts` anyway.
        table = packed[dorder]                 # [N, 16]
        s_b = (s_sorted[:budget] if wide
               else (k_b & jnp.uint32(RANK_CAP - 1)).astype(jnp.int32))
    else:
        table = packed[morder] if use_morton else packed   # [N, 16]
        s_b = s_sorted[:budget]

    rows = table[s_b].T                        # [16, budget]
    bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) if wide else
              (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << RANK_BITS))
    starts = jnp.searchsorted(k_b, bounds).astype(jnp.int32)
    return rows, starts, n_valid


def pack_attribute_table(prep, features):
    """[N, PW] packed per-Gaussian attribute rows (HDR=8 layout of
    ops/tile_composite): [pix_x, pix_y, conic0..2, ln_op, 0, 0, r, g, b,
    feat_0..L-1, depth, pad...]. ONE stacked build: separate .at[:, i].set
    column writes into the row-major table each cost a full stride-16 pass
    (~0.8 ms at N=200k measured — they dominated the emission stage)."""
    n = prep["depth"].shape[0]
    ln_op = jnp.log(jnp.maximum(prep["opacity"], 1e-30))
    L = features.shape[1]
    zero = jnp.zeros((n,), jnp.float32)
    col_list = [
        prep["point_image"][:, 0], prep["point_image"][:, 1],
        prep["conic"][:, 0], prep["conic"][:, 1], prep["conic"][:, 2],
        ln_op, zero, zero,
        prep["colors"][:, 0], prep["colors"][:, 1], prep["colors"][:, 2],
        *[features[:, i] for i in range(L)],
        prep["depth"],
    ]
    col_list += [zero] * (PW - len(col_list))
    return jnp.stack(col_list, axis=1)


def _morton_table_order(settings, prep, use_morton: bool):
    """(morder, mpos): the Morton table permutation and its inverse.

    Optional (costs one argsort + one inverse-permutation scatter); buys
    locality in the budgeted row gather — A/B via settings.stream_morton.
    """
    n = prep["depth"].shape[0]
    ts = settings.tile_size
    if not use_morton:
        idx = jnp.arange(n, dtype=jnp.int32)
        return idx, idx
    tx_c = jnp.clip((prep["point_image"][:, 0] / ts).astype(jnp.int32),
                    0, settings.tiles_x - 1)
    ty_c = jnp.clip((prep["point_image"][:, 1] / ts).astype(jnp.int32),
                    0, settings.tiles_y - 1)
    morder = jnp.argsort(_morton_u32(tx_c, ty_c), stable=False)
    mpos = jnp.zeros(n, jnp.int32).at[morder].set(
        jnp.arange(n, dtype=jnp.int32))
    return morder, mpos


def _narrow_sorted_pairs(settings, prep, src_ids, *, tiers, ellipse_cull,
                         tile_band=None, carry_src=True, rank=None,
                         wide=False):
    """Shared narrow-sort emission: -> (k_sorted [M] u32, s_sorted [M] i32
    or None, n_valid, dorder [N] i32). `src_ids` [N] i32 is the
    per-Gaussian payload carried through the sort (Morton position for the
    render build, original id for the training build). Keys pack
    (band-local tile) << RANK_BITS | depth_rank; invalid slots get
    KEY_SENTINEL and sort to the end.

    `carry_src=False` drops the src payload column entirely: the key's low
    RANK_BITS are a bijection onto Gaussians (rank -> dorder[rank]), so a
    SINGLE-COLUMN u32 sort suffices and the caller recovers the source row
    as `k & (RANK_CAP-1)` against a rank-ordered table (`packed[dorder]`).
    Halves the sort payload (PERF.md: sort cost is linear in columns) and
    skips the src emission/broadcast entirely.

    `wide=True` lifts the packed-u32 limits (capacity <= 2^18, tiles <
    2^14) for the reference's 360k operating point (train.py:399): tile
    and depth-rank travel as TWO u32 sort-key columns (num_keys=2) instead
    of one packed key — (tile, rank) lex order is identical, capacity now
    bounded only by f32-exact integer emission (2^24). k_sorted is then
    the TILE column (sentinel KEY_SENTINEL), and with carry_src=False
    s_sorted returns the sorted RANK column (the rank->row recovery that
    the packed key's low bits provide in narrow mode). Cost: one extra u32
    sort column — the measured 2-col arm, within noise of single-key
    (PERF.md r4 sweep).

    `rank` overrides the depth ranks (u32 [n]): the multi-chip scatter
    build (parallel/render.py) emits from a LOCAL Gaussian shard but needs
    GLOBALLY consistent ranks so keys merge into (tile, depth) order across
    chips — it passes this chip's slice of the full-depth argsort ranks
    (values may exceed n; the caller guarantees they fit RANK_BITS).
    `dorder` returns None in that mode (no local rank->row bijection)."""
    n = prep["depth"].shape[0]
    tiles_x = settings.tiles_x
    ts = settings.tile_size
    if tile_band is None:
        ty0, band_rows = 0, settings.tiles_y
    else:
        ty0, band_rows = tile_band
    num_tiles = band_rows * tiles_x
    if not wide and (n > RANK_CAP or num_tiles >= (1 << 14)):
        raise ValueError(
            f"narrow stream build needs capacity<=2^18 and tiles<2^14 "
            f"(got {n}, {num_tiles}); pass wide=True")
    if wide and (n >= (1 << 24) or num_tiles >= (1 << 24)):
        raise ValueError(
            f"wide stream build needs capacity and tiles < 2^24 "
            f"(f32-exact integer emission; got {n}, {num_tiles})")

    rmin = prep["rect_min"].astype(jnp.int32)
    rmax = prep["rect_max"].astype(jnp.int32)
    vis = prep["visible"]
    depth = prep["depth"]
    span_x = rmax[:, 0] - rmin[:, 0]
    span_y = rmax[:, 1] - rmin[:, 1]

    # ---- depth ranks: rank[g] = position of g in front-to-back order ----
    if rank is None:
        big = jnp.where(vis, depth, jnp.inf)
        dorder = jnp.argsort(big, stable=False)
        rank = jnp.zeros(n, jnp.uint32).at[dorder].set(
            jnp.arange(n, dtype=jnp.uint32))
    else:
        dorder = None   # global override: no local rank->row bijection

    # ellipse-cull threshold: alpha >= 1/255 iff q <= 2*ln(255*op)
    t2 = 2.0 * jnp.log(jnp.maximum(255.0 * prep["opacity"], 1.0))
    conic = prep["conic"]
    pix = prep["point_image"]

    import numpy as np

    key_parts, rank_parts, src_parts = [], [], []

    def emit(fields, active, slots):
        """Emit one tier's slots as (key, src) pairs.

        `fields` = (r0x, r0y, r1x, r1y, rank_f, src_f, cA, cB, cC, px, py,
        t2) — all f32 (integer fields are exact below 2^24)."""
        r0x, r0y, r1x, r1y, d_rank, d_src, cA, cB, cC, px, py, tt2 = fields
        dxs = jnp.asarray(np.array([s[0] for s in slots],
                                   np.float32))[:, None]
        dys = jnp.asarray(np.array([s[1] for s in slots],
                                   np.float32))[:, None]
        txs = r0x[None, :] + dxs                       # [S, B] f32
        tys = r0y[None, :] + dys
        ok = active[None, :] & (txs < r1x[None, :]) & (tys < r1y[None, :])
        if tile_band is not None:                      # tile-band restrict
            ty0f = jnp.asarray(ty0, jnp.float32)
            ok = ok & (tys >= ty0f) & (tys < ty0f + float(band_rows))
        if ellipse_cull:
            q = _tile_min_quad(
                cA[None, :], cB[None, :], cC[None, :], px[None, :],
                py[None, :],
                txs * float(ts), txs * float(ts) + (ts - 1.0),
                tys * float(ts), tys * float(ts) + (ts - 1.0))
            ok = ok & (q <= tt2[None, :])
        ty_loc = tys if tile_band is None \
            else tys - jnp.asarray(ty0, jnp.float32)
        tile = (txs + ty_loc * tiles_x).astype(jnp.uint32)
        rank_u = d_rank.astype(jnp.uint32)[None, :]
        if wide:
            # two u32 key columns (tile, rank): same lex order, no bit caps
            key_parts.append(jnp.where(ok, tile, KEY_SENTINEL).reshape(-1))
            rank_parts.append(
                jnp.broadcast_to(rank_u, ok.shape).reshape(-1))
        else:
            key = (tile << RANK_BITS) | rank_u
            key_parts.append(jnp.where(ok, key, KEY_SENTINEL).reshape(-1))
        if carry_src:
            src_parts.append(jnp.broadcast_to(
                d_src.astype(jnp.int32)[None, :], ok.shape).reshape(-1))

    fields_full = (
        rmin[:, 0].astype(jnp.float32), rmin[:, 1].astype(jnp.float32),
        rmax[:, 0].astype(jnp.float32), rmax[:, 1].astype(jnp.float32),
        rank.astype(jnp.float32), src_ids.astype(jnp.float32),
        conic[:, 0], conic[:, 1], conic[:, 2], pix[:, 0], pix[:, 1], t2)

    t1_slots = [(dx, dy) for dy in range(2) for dx in range(2)]
    emit(fields_full, vis, t1_slots)

    # Shared span-descending order replaces a top_k per rung (each rung's
    # candidate set is a prefix of this order), and ALL emission fields are
    # reordered in ONE [N, 13] row gather — per-rung per-field 1-D gathers
    # measured ~0.8 ms EACH (11 rungs x 10 fields dominated the build).
    span_key = jnp.where(vis, jnp.maximum(span_x, span_y), -1)
    sorder = jnp.argsort(-span_key, stable=False)
    emis = jnp.stack(list(fields_full)
                     + [span_key.astype(jnp.float32)], axis=1)[sorder]
    prev_span = 2
    for span_i, count_i in tiers:
        e_i = emis[:min(count_i, n)]
        sel_i = e_i[:, 12] > prev_span
        slots_i = [(dx, dy) for dy in range(span_i) for dx in range(span_i)
                   if not (dx < prev_span and dy < prev_span)]
        emit(tuple(e_i[:, j] for j in range(12)), sel_i, slots_i)
        prev_span = span_i

    key_all = jnp.concatenate(key_parts)
    n_valid = jnp.sum(key_all != KEY_SENTINEL).astype(jnp.int32)

    # is_stable=False: every valid key is unique (a Gaussian emits each tile
    # at most once across the nested rungs), and sentinel slots land past the
    # last tile's searchsorted bound — the stable sort measures 2-4x slower.
    if wide:
        rank_all = jnp.concatenate(rank_parts)
        if carry_src:
            src_all = jnp.concatenate(src_parts)
            k_sorted, _, s_sorted = jax.lax.sort(
                (key_all, rank_all, src_all), num_keys=2, is_stable=False)
        else:
            # the sorted rank column IS the src recovery (rank-ordered table)
            k_sorted, r_sorted = jax.lax.sort(
                (key_all, rank_all), num_keys=2, is_stable=False)
            s_sorted = r_sorted.astype(jnp.int32)
        return k_sorted, s_sorted, n_valid, dorder
    if not carry_src:
        k_sorted = jax.lax.sort(key_all, is_stable=False)
        return k_sorted, None, n_valid, dorder
    src_all = jnp.concatenate(src_parts)
    k_sorted, s_sorted = jax.lax.sort((key_all, src_all), num_keys=1,
                                      is_stable=False)
    return k_sorted, s_sorted, n_valid, dorder


def build_stream_train(
    settings,
    prep: Dict[str, jnp.ndarray],
    *,
    tiers: Tuple[Tuple[int, int], ...],
    budget: int,
    chunk: int = 128,
    ellipse_cull: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Chunk-aligned stream build for the TRAINING path (stream_vjp.py).

    Like build_stream_narrow this sorts (tile<<18 | depth-rank, src) pairs
    only, but instead of gathering a stop-gradient row table it returns the
    slot -> Gaussian INDEX map remapped onto a `chunk`-aligned layout, so the
    caller can do ONE differentiable gather `packed[src]` whose VJP is one
    scatter-add. The alignment guarantees every `chunk`-wide block of slots
    belongs to exactly ONE tile (each segment starts on a chunk boundary and
    every tile owns >= 1 chunk), which is what lets the backward kernel
    write its per-slot gradient rows with no cross-tile write conflicts and
    the fwd/bwd kernels run with the chunk index as the (sequential) pallas
    grid.

    Returns dict:
      src        [B_al] i32  original Gaussian index per aligned slot
      valid      [B_al] bool slot holds a real (tile, Gaussian) pair
      starts     [T+1]  i32  aligned segment starts (multiples of `chunk`)
      chunk_tile [B_al/chunk] i32  owning tile per chunk (pallas prefetch)
      n_valid    []     i32  total emitted valid slots (overflow telemetry:
                             slots beyond `budget` are dropped — and because
                             keys sort by (tile, rank), truncation removes
                             the HIGHEST-numbered tiles wholesale, not a
                             sprinkle across the image. The loop's audit
                             (train/loop.py _tune_stream_train) re-sizes at
                             densify cadence precisely so this never fires
                             silently between audits.)
    where B_al = budget + num_tiles * chunk (static).
    """
    prep = jax.lax.stop_gradient(prep)
    g = int(chunk)
    num_tiles = settings.num_tiles
    budget = int(budget)
    if budget % g:
        raise ValueError(f"budget {budget} must be a multiple of chunk {g}")
    b_al = budget + num_tiles * g              # worst-case aligned capacity
    n_chunks = b_al // g

    use_morton = getattr(settings, "stream_morton", False)
    morder, mpos = _morton_table_order(settings, prep, use_morton)
    n = prep["depth"].shape[0]
    wide = n > RANK_CAP or num_tiles >= (1 << 14)   # 360k training support
    k_sorted, s_sorted, n_valid, _dorder = _narrow_sorted_pairs(
        settings, prep, mpos, tiers=tiers, ellipse_cull=ellipse_cull,
        wide=wide)
    budget = min(budget, int(k_sorted.shape[0]))
    k_b = k_sorted[:budget]
    # compose the Morton permutation back to original ids: ONE [budget]
    # int32 gather instead of gathering rows through a reordered table
    s_b = morder[s_sorted[:budget]] if use_morton else s_sorted[:budget]

    bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) if wide else
              (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << RANK_BITS))
    raw_starts = jnp.searchsorted(k_b, bounds).astype(jnp.int32)  # [T+1]

    # ---- chunk-aligned remap ----
    seg_len = raw_starts[1:] - raw_starts[:-1]                    # [T]
    seg_chunks = jnp.maximum(-(-seg_len // g), 1)                 # >=1 chunk
    chunk_end = jnp.cumsum(seg_chunks)                            # [T]
    chunk_start = chunk_end - seg_chunks
    cidx = jnp.arange(n_chunks, dtype=jnp.int32)
    # tail chunks (beyond the last used one) clamp to the last tile; their
    # slots are invalid so they contribute nothing
    chunk_tile = jnp.clip(
        jnp.searchsorted(chunk_end, cidx, side="right"),
        0, num_tiles - 1).astype(jnp.int32)
    p = jnp.arange(b_al, dtype=jnp.int32)
    t_p = chunk_tile[p // g]
    off = p - chunk_start[t_p] * g             # position within the segment
    valid = (off >= 0) & (off < seg_len[t_p])
    j = jnp.clip(raw_starts[t_p] + off, 0, budget - 1)
    src = jnp.where(valid, s_b[j], 0)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), chunk_end.astype(jnp.int32) * g])
    return dict(src=src, valid=valid, starts=starts,
                chunk_tile=chunk_tile, n_valid=n_valid)


def narrow_valid_count(settings, prep, *, tiers, ellipse_cull=True):
    """Count of VALID slots build_stream_narrow would emit (rect-clipped +
    ellipse-culled) — jit this once per scene to size `stream_budget`
    without paying the sort/gather compile. Mirrors the emit() validity
    logic exactly (same rect tests, same conic quad-min cull)."""
    n = prep["depth"].shape[0]
    ts = settings.tile_size
    rmin = prep["rect_min"].astype(jnp.int32)
    rmax = prep["rect_max"].astype(jnp.int32)
    vis = prep["visible"]
    span_x = rmax[:, 0] - rmin[:, 0]
    span_y = rmax[:, 1] - rmin[:, 1]
    t2 = 2.0 * jnp.log(jnp.maximum(255.0 * prep["opacity"], 1.0))
    conic = prep["conic"]
    pix = prep["point_image"]

    import numpy as np

    def count(idx, active, slots):
        if idx is None:
            r0x, r0y, r1x, r1y = rmin[:, 0], rmin[:, 1], rmax[:, 0], rmax[:, 1]
            cA, cB, cC = conic[:, 0], conic[:, 1], conic[:, 2]
            px, py, tt2 = pix[:, 0], pix[:, 1], t2
        else:
            r0x, r0y = rmin[idx, 0], rmin[idx, 1]
            r1x, r1y = rmax[idx, 0], rmax[idx, 1]
            cA, cB, cC = conic[idx, 0], conic[idx, 1], conic[idx, 2]
            px, py, tt2 = pix[idx, 0], pix[idx, 1], t2[idx]
        dxs = jnp.asarray(np.array([s[0] for s in slots], np.int32))[:, None]
        dys = jnp.asarray(np.array([s[1] for s in slots], np.int32))[:, None]
        txs = r0x[None, :] + dxs
        tys = r0y[None, :] + dys
        ok = active[None, :] & (txs < r1x[None, :]) & (tys < r1y[None, :])
        if ellipse_cull:
            q = _tile_min_quad(
                cA[None, :], cB[None, :], cC[None, :], px[None, :],
                py[None, :],
                txs * float(ts), txs * float(ts) + (ts - 1.0),
                tys * float(ts), tys * float(ts) + (ts - 1.0))
            ok = ok & (q <= tt2[None, :])
        return jnp.sum(ok)

    total = count(None, vis, [(dx, dy) for dy in range(2) for dx in range(2)])
    span_key = jnp.where(vis, jnp.maximum(span_x, span_y), -1)
    sorder = jnp.argsort(-span_key, stable=False)
    prev_span = 2
    for span_i, count_i in tiers:
        idx_i = sorder[:min(count_i, n)]
        sel_i = span_key[idx_i] > prev_span
        slots_i = [(dx, dy) for dy in range(span_i) for dx in range(span_i)
                   if not (dx < prev_span and dy < prev_span)]
        total = total + count(idx_i, sel_i, slots_i)
        prev_span = span_i
    return total.astype(jnp.int32)


#: candidate tier spans for autotuning, finest-first. A finer ladder wastes
#: fewer emitted slots (a span-4 Gaussian in a span-6 tier emits 6^2-2^2=32
#: slots for <=16 covered tiles); the cost of more rungs is only more
#: (tiny) prefix slices of one shared span order at build time.
TIER_LADDER = (3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96)


def _round_cap(x: float, granule: int = 128, min_cap: int = 128) -> int:
    # fine granule: emitted slots = capacity x slots-per-rung, so a coarse
    # round-up on a big-span rung (hundreds of slots each) costs the sort
    # hundreds of thousands of sentinel entries
    import math
    return max(min_cap, int(math.ceil(x / granule)) * granule)


def autotune_tiers(spans: "np.ndarray", *, margin: float = 1.25,
                   min_cap: int = 128) -> Tuple[Tuple[int, int], ...]:
    """Derive stream tiers from a measured span distribution (host-side).

    `spans` = per-visible-Gaussian tile span (max of x/y rect extent). For
    each ladder rung the capacity is the margin-padded, granule-rounded
    count of Gaussians whose span exceeds the previous rung — every Gaussian
    is guaranteed a tier that fully covers its rect, so rendering is EXACT
    on the audited scene (the CUDA reference gets the same guarantee from
    dynamic allocation; static XLA shapes get it from this once-per-scene
    retune + recompile). Rungs beyond the observed max span are dropped.
    """
    import numpy as np
    spans = np.asarray(spans)
    max_span = int(spans.max()) if spans.size else 2
    tiers = []
    prev = 2
    for s in TIER_LADDER:
        if prev >= max_span:
            break
        demand = int((spans > prev).sum())
        if demand == 0:
            break
        # capacity covers ALL spans > prev (not just this rung's band): a
        # bigger-span Gaussian must be selected at EVERY rung up to its own
        # (build_stream accumulates nested rects), and top_k picks the
        # largest areas first
        tiers.append((s, _round_cap(demand * margin, min_cap=min_cap)))
        prev = s
    if not tiers:
        return ((3, min_cap),)
    return tuple(tiers)


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
