"""Multi-chip rendering: tile-band model parallelism over the device mesh.

A NEW capability relative to the reference (strictly single-GPU, SURVEY §2
"Parallelism"). The render frame has two axes worth sharding:

- the GAUSSIAN axis (N): preprocess (projection, conics, SH) is per-Gaussian
  and embarrassingly parallel — it runs shard-local on the mesh's "gauss"
  axis exactly as training does (parallel/mesh.py);
- the TILE axis (T): binning + compositing partition by IMAGE REGION. Each
  device takes a contiguous band of tile rows, emits/sorts/gathers ONLY its
  band's (Gaussian, tile) slots (render/stream.py `tile_band`), and
  composites its band of pixels. Sort cost — the dominant build stage —
  scales 1/D, and the composite writes are disjoint by construction.

Between the two stages sits ONE collective: an all-gather of the packed
per-Gaussian render attributes (~16 f32 per visible Gaussian — 13 MB at
200k, a single ICI hop), the transpose of the scaling-book's "gather the
small thing, keep the big thing local" rule: the slot stream (the big
thing, ~1.5M rows) never crosses chips.

Exactness: every band applies the same rect + ellipse-cull tests and the
same (tile, depth-rank) order as the single-chip narrow build — the band
builds are bit-identical to the full build's per-band segments; the only
deviation is one reassociated f32 subtraction in the composite (pix_y is
shifted into the band frame), observed <= 5e-7 on the stitched image vs a
JITTED single-chip render
(tests/test_parallel.py::test_band_sharded_render_matches_single_device).
Comparing against an EAGER single-chip render additionally shows XLA's
fusion-level FMA contraction (~4e-6 on preprocess outputs, up to ~7e-5
after compositing) — that is an eager-vs-jit artifact, not a multi-chip
one: the band image is bit-identical to the jitted single-chip image's
preprocess stage.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from langsplat4d.parallel.mesh import GAUSS_AXIS


def render_tiles_sharded(
    settings,
    cam,
    means3d: jnp.ndarray,        # [N, 3] sharded on `axis`
    opacities: jnp.ndarray,      # [N, 1]
    scales: jnp.ndarray,         # [N, 3]
    rotations: jnp.ndarray,      # [N, 4]
    colors: jnp.ndarray,         # [N, 3] (ignored when shs given)
    features: jnp.ndarray,       # [N, L]
    active: jnp.ndarray,         # [N] bool
    bg: jnp.ndarray,             # [3]
    mesh,
    *,
    axis: str = GAUSS_AXIS,
    tiers: Tuple[Tuple[int, int], ...],
    budget: int,
    ellipse_cull: bool = True,
    shs: jnp.ndarray | None = None,   # [N, K, 3] SH coeffs (shard-local eval)
) -> jnp.ndarray:
    """-> [c_out, H, W] image, sharded along H (tile-row bands); c_out is
    the composite's channel stack (rgb + lang + padding + accum-alpha,
    same layout as the single-device composite output).

    Inputs arrive sharded on the mesh `axis` (row sharding, as train-state
    params are); the image leaves sharded along its height. `budget` is the
    PER-BAND slot budget (size from narrow_valid_count of the worst band,
    or total/D with margin).
    """
    use_shs = shs is not None
    color_in = shs if use_shs else colors   # both shard their leading dim
    fn = _sharded_render_fn(settings, mesh, axis, tiers, budget,
                            ellipse_cull, use_shs)
    img = fn(cam, means3d, opacities, scales, rotations, color_in,
             features, active, bg)
    return img[:, : settings.image_height, :]


@functools.lru_cache(maxsize=64)
def _sharded_render_fn(settings, mesh, axis, tiers, budget, ellipse_cull,
                       use_shs):
    """Jitted shard_map for render_tiles_sharded, memoized per static
    config: rebuilding the closure per call would key jit's compile cache
    to a fresh function object each invocation and recompile every frame
    at eager call sites (ADVICE r4)."""
    from langsplat4d.ops.tile_composite import composite_stream_pallas
    from langsplat4d.render.raster import preprocess
    from langsplat4d.render.stream import build_stream_narrow

    d = mesh.shape[axis]
    ts = settings.tile_size
    tiles_y, tiles_x = settings.tiles_y, settings.tiles_x
    # uneven split: bands cover ceil(tiles_y/d) rows each; trailing rows of
    # the last band lie past the image, receive no slots (the emission's
    # rect test bounds tys by the real tile rows) and are cropped below
    band_rows = -(-tiles_y // d)

    def shard_fn(cam_in, xyz, op, sc, rot, cols, feats, act, bg_in):
        # 1. shard-local preprocess over this chip's Gaussian rows (SH
        # evaluation is per-Gaussian, so it stays shard-local too)
        if use_shs:
            prep = preprocess(settings, cam_in, xyz,
                              jnp.zeros_like(xyz[:, :2]), op, sc, rot, cols,
                              None, active=act)
        else:
            prep = preprocess(settings, cam_in, xyz,
                              jnp.zeros_like(xyz[:, :2]), op, sc, rot, None,
                              colors_precomp=cols, active=act)
        # 2. all-gather the small per-Gaussian attributes (one ICI hop);
        #    tiled=True concatenates along the row axis
        gather = lambda x: jax.lax.all_gather(x, axis, tiled=True)
        prep_full = {k: gather(v) for k, v in prep.items()}
        feats_full = gather(feats)
        # 3. band-local narrow build: this chip's tile rows only
        ty0 = jax.lax.axis_index(axis).astype(jnp.int32) * band_rows
        rows, starts, _ = build_stream_narrow(
            settings, prep_full, feats_full, tiers=tiers, budget=budget,
            ellipse_cull=ellipse_cull, tile_band=(ty0, band_rows))
        # the composite kernel derives each tile's pixel origin from its
        # BAND-LOCAL index (oy = tile // tiles_x * ts), while the packed
        # pix_y column is in global image coordinates — shift it into the
        # band's frame so the quadratic evaluates at the right offset
        rows = rows.at[1].add(-(ty0.astype(jnp.float32) * ts))
        # 4. composite this band's tiles
        out = composite_stream_pallas(
            rows, starts, bg_in, tiles_x=tiles_x,
            num_tiles=band_rows * tiles_x, tile_size=ts,
            tb=settings.pallas_tile_block,
            g=settings.composite_chunk,
            hard_cutoffs=settings.hard_cutoffs)
        # channel count comes from the packed-table width (the narrow build
        # pads attribute columns to PW=16): c_out = PW - HDR + 1, same layout
        # as the single-device composite output.
        out = out[: band_rows * tiles_x]
        c_out = out.shape[1]
        img = out.reshape(band_rows, tiles_x, c_out, ts, ts)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            c_out, band_rows * ts, tiles_x * ts)
        return img[:, :, : settings.image_width]

    # jit the whole shard_map: eager shard_map dispatches (and on a slow
    # host, compiles) every inner primitive as its own pjit — minutes of
    # lowering for the eager test/dryrun call sites. Under an outer jit
    # this inner jit is a no-op.
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P()),
        out_specs=P(None, axis, None),
        check_vma=False))


def shard_tiers(tiers, d: int, margin: float = 2.0):
    """Per-shard span tiers for the scatter build: each chip emits from its
    own N/D Gaussian rows, so rung capacities shrink ~1/D (margin absorbs
    shard skew in the span distribution)."""
    return tuple((span, max(128, int(-(-count * margin // d))))
                 for span, count in tiers)


def render_tiles_scatter(
    settings,
    cam,
    means3d: jnp.ndarray,        # [N, 3] sharded on `axis`
    opacities: jnp.ndarray,      # [N, 1]
    scales: jnp.ndarray,         # [N, 3]
    rotations: jnp.ndarray,      # [N, 4]
    colors: jnp.ndarray,         # [N, 3] (ignored when shs given)
    features: jnp.ndarray,       # [N, L]
    active: jnp.ndarray,         # [N] bool
    bg: jnp.ndarray,             # [3]
    mesh,
    *,
    axis: str = GAUSS_AXIS,
    tiers: Tuple[Tuple[int, int], ...],
    bucket: int,
    ellipse_cull: bool = True,
    shs: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian-axis-sharded stream build with per-chip tile ownership
    (PERF.md roadmap #4; VERDICT r3 missing #4): -> ([c_out, H, W] image
    sharded along H, dropped-slot count [] i32 — 0 means exact).

    Unlike `render_tiles_sharded` (which all-gathers EVERY per-Gaussian
    attribute — O(N) bytes/chip — and then has each chip emit over the full
    N), here every stage before the exchange scales 1/D:

    1. shard-local preprocess over this chip's N/D Gaussian rows;
    2. one all-gather of (depth, visible) ONLY (~N x 5 B — 1 MB at 200k,
       vs ~13 MB for the full attribute gather) to compute GLOBALLY
       consistent depth ranks, so keys from different chips merge into the
       same (tile, depth-rank) order the single-chip build produces;
    3. shard-local emission + sort of the local shard's (Gaussian, tile)
       pairs over ALL tiles — M/D slots;
    4. ONE all-to-all: the local sorted stream is contiguous per
       destination band, so each band owner receives its (key, packed-row)
       slots — O(slots/D x 68 B) per chip, the only place slot data
       crosses ICI;
    5. owner-side merge (one small (key, idx) sort of the received
       buckets) + band composite.

    `bucket` is the per-(src, dst) slot capacity: slots beyond it within
    one (chip, band) pair are dropped and counted in the returned audit
    (size from `narrow_valid_count` / D^2 with skew margin; the returned
    count makes truncation observable, mirroring `stream_overflow`).

    Requires N <= 2^18 (global ranks must fit the key's RANK_BITS)."""
    from langsplat4d.render.stream import RANK_BITS

    d = mesh.shape[axis]
    band_tiles = -(-settings.tiles_y // d) * settings.tiles_x
    n_total = means3d.shape[0]
    if n_total > (1 << RANK_BITS):
        raise ValueError(
            f"scatter build needs N<=2^{RANK_BITS} for global ranks "
            f"(got {n_total})")
    if d * band_tiles >= (1 << 14):
        raise ValueError(
            f"scatter build needs padded tiles d*ceil(T_y/d)*T_x < 2^14 "
            f"(got {d * band_tiles}; u32 key packing)")

    use_shs = shs is not None
    color_in = shs if use_shs else colors
    fn = _scatter_render_fn(settings, mesh, axis, tiers, bucket,
                            ellipse_cull, use_shs, n_total)
    img, dropped = fn(cam, means3d, opacities, scales, rotations, color_in,
                      features, active, bg)
    return img[:, : settings.image_height, :], dropped


@functools.lru_cache(maxsize=64)
def _scatter_render_fn(settings, mesh, axis, tiers, bucket, ellipse_cull,
                       use_shs, n_total):
    """Jitted shard_map for render_tiles_scatter, memoized per static
    config (see _sharded_render_fn; ADVICE r4)."""
    from langsplat4d.ops.tile_composite import composite_stream_pallas
    from langsplat4d.render.raster import preprocess
    from langsplat4d.render.stream import (KEY_SENTINEL, RANK_BITS,
                                           _narrow_sorted_pairs,
                                           pack_attribute_table)

    d = mesh.shape[axis]
    ts = settings.tile_size
    tiles_y, tiles_x = settings.tiles_y, settings.tiles_x
    band_rows = -(-tiles_y // d)
    band_tiles = band_rows * tiles_x

    def shard_fn(cam_in, xyz, op, sc, rot, cols, feats, act, bg_in):
        n_loc = xyz.shape[0]
        # 1. shard-local preprocess
        if use_shs:
            prep = preprocess(settings, cam_in, xyz,
                              jnp.zeros_like(xyz[:, :2]), op, sc, rot, cols,
                              None, active=act)
        else:
            prep = preprocess(settings, cam_in, xyz,
                              jnp.zeros_like(xyz[:, :2]), op, sc, rot, None,
                              colors_precomp=cols, active=act)
        # 2. global depth ranks from a depth+visibility-only all-gather
        depth_all = jax.lax.all_gather(prep["depth"], axis, tiled=True)
        vis_all = jax.lax.all_gather(prep["visible"], axis, tiled=True)
        big = jnp.where(vis_all, depth_all, jnp.inf)
        dorder = jnp.argsort(big, stable=False)
        rank_full = jnp.zeros(n_total, jnp.uint32).at[dorder].set(
            jnp.arange(n_total, dtype=jnp.uint32))
        c = jax.lax.axis_index(axis)
        rank_loc = jax.lax.dynamic_slice(
            rank_full, (c.astype(jnp.int32) * n_loc,), (n_loc,))
        # 3. shard-local emission + sort over ALL tiles (global tile ids,
        # global ranks): keys from different chips interleave correctly
        k_sorted, s_sorted, _n_valid, _ = _narrow_sorted_pairs(
            settings, prep, jnp.arange(n_loc, dtype=jnp.int32), tiers=tiers,
            ellipse_cull=ellipse_cull, rank=rank_loc)
        packed = pack_attribute_table(prep, feats)      # [n_loc, PW]
        # 4. per-destination buckets: the sorted stream is contiguous per
        # band, so dst j's slots are k_sorted[starts[j]:starts[j+1]]
        bnds = (jnp.arange(d + 1, dtype=jnp.uint32)
                * jnp.uint32(band_tiles)) << RANK_BITS
        starts_dst = jnp.searchsorted(k_sorted, bnds).astype(jnp.int32)
        off = jnp.arange(bucket, dtype=jnp.int32)
        keys_out, rows_out, dropped = [], [], jnp.zeros((), jnp.int32)
        for j in range(d):
            kj = jax.lax.dynamic_slice(k_sorted, (starts_dst[j],), (bucket,))
            sj = jax.lax.dynamic_slice(s_sorted, (starts_dst[j],), (bucket,))
            seg = starts_dst[j + 1] - starts_dst[j]
            ok = off < seg
            keys_out.append(jnp.where(ok, kj, KEY_SENTINEL))
            rows_out.append(packed[sj])                 # [bucket, PW]
            dropped = dropped + jnp.maximum(seg - bucket, 0)
        keys_out = jnp.stack(keys_out)                  # [d, bucket]
        rows_out = jnp.stack(rows_out)                  # [d, bucket, PW]
        # the ONE slot exchange: piece j -> chip j
        keys_in = jax.lax.all_to_all(keys_out, axis, 0, 0)
        rows_in = jax.lax.all_to_all(rows_out, axis, 0, 0)
        # 5. owner-side merge: one (key, idx) sort of d*bucket received
        # slots (sentinel padding sorts past the band's last bound)
        kf = keys_in.reshape(-1)
        m = kf.shape[0]
        ksrt, idx = jax.lax.sort(
            (kf, jnp.arange(m, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        rows = rows_in.reshape(m, -1)[idx].T            # [PW, m]
        t0 = (c.astype(jnp.uint32) * jnp.uint32(band_tiles))
        my_bnds = (t0 + jnp.arange(band_tiles + 1,
                                   dtype=jnp.uint32)) << RANK_BITS
        # routing guarantees every non-sentinel key lies in this band, so
        # starts[0] == 0 and the offsets index the rows buffer directly
        starts = jnp.searchsorted(ksrt, my_bnds).astype(jnp.int32)
        ty0 = c.astype(jnp.float32) * float(band_rows)
        rows = rows.at[1].add(-(ty0 * ts))
        out = composite_stream_pallas(
            rows, starts, bg_in, tiles_x=tiles_x, num_tiles=band_tiles,
            tile_size=ts, tb=settings.pallas_tile_block,
            g=settings.composite_chunk, hard_cutoffs=settings.hard_cutoffs)
        out = out[:band_tiles]
        c_out = out.shape[1]
        img = out.reshape(band_rows, tiles_x, c_out, ts, ts)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            c_out, band_rows * ts, tiles_x * ts)
        return (img[:, :, : settings.image_width],
                jax.lax.psum(dropped, axis))

    # see _sharded_render_fn: jit to avoid eager-shard_map per-primitive
    # dispatch/compile at the eager (test/dryrun) call sites
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P()),
        out_specs=(P(None, axis, None), P()),
        check_vma=False))


def render_frame_banded(
    settings,
    dcfg,
    stage: str,
    cam,
    time: jnp.ndarray,
    gs,
    deform_params,
    aabb: jnp.ndarray,
    bg: jnp.ndarray,
    mesh,
    *,
    tiers: Tuple[Tuple[int, int], ...],
    budget: int,
    axis: str = GAUSS_AXIS,
    nonormalized: bool = False,
    grid_spatial=None,
    ellipse_cull: bool = True,
    exchange: str = "allgather",
):
    """Full multi-chip frame: deformation under jit (per-Gaussian — XLA
    keeps it shard-local given gauss-sharded state), then the tile-band
    build + composite. The CLI entry behind `runtime.gaussian_shards > 1`
    in render.py (render/driver.py).

    Returns the render dict subset the driver consumes:
    {render [3,H,W], language_feature_image [L,H,W], depth [1,H,W]}.
    """
    from langsplat4d.render.pipeline import prepare_attributes

    (means3d, scales_act, rotations_act, opacity_act, shs, lang,
     _coff) = prepare_attributes(
        dcfg, stage, time, gs, deform_params, aabb,
        nonormalized=nonormalized, grid_spatial=grid_spatial)
    feats = lang if settings.include_feature else (
        jnp.zeros((gs.capacity, 0), means3d.dtype))
    if exchange == "alltoall":
        d = mesh.shape[axis]
        band_tiles = -(-settings.tiles_y // d) * settings.tiles_x
        from langsplat4d.render.stream import RANK_BITS
        if (gs.capacity > (1 << RANK_BITS)
                or d * band_tiles >= (1 << 14)):
            # the scatter exchange's packed u32 key caps out (capacity >
            # 2^18 or too many padded tiles): degrade gracefully to the
            # all-gather band exchange instead of raising (VERDICT r4
            # missing #4) — same image, different communication pattern
            import logging
            logging.getLogger("langsplat4d").warning(
                "scatter exchange needs capacity<=2^18 and padded tiles "
                f"<2^14 (got {gs.capacity}, {d * band_tiles}); falling "
                "back to the all-gather band exchange")
            exchange = "allgather"
    if exchange == "alltoall":
        # per-chip tile ownership: `budget` is the per-(src, dst) bucket
        img, _dropped = render_tiles_scatter(
            settings, cam, means3d, opacity_act, scales_act, rotations_act,
            jnp.zeros((gs.capacity, 3), means3d.dtype), feats,
            gs.active_mask(), bg, mesh, axis=axis,
            tiers=shard_tiers(tiers, d), bucket=budget,
            ellipse_cull=ellipse_cull, shs=shs)
    else:
        img = render_tiles_sharded(
            settings, cam, means3d, opacity_act, scales_act, rotations_act,
            jnp.zeros((gs.capacity, 3), means3d.dtype), feats,
            gs.active_mask(), bg, mesh, axis=axis, tiers=tiers,
            budget=budget, ellipse_cull=ellipse_cull, shs=shs)
    c_lang = feats.shape[1]
    return {
        "render": img[:3],
        "language_feature_image": (img[3:3 + c_lang]
                                   if settings.include_feature else None),
        "depth": img[3 + c_lang:4 + c_lang],
    }
