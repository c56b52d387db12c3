#!/usr/bin/env python
"""Build-cost-vs-D model for the two multi-chip stream-build exchanges
(VERDICT r3 missing #4 closure).

For each mesh size D this script EXECUTES the build path on the virtual CPU
mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) at the
bench-scale scene to capture the EXACT per-chip work quantities — emission
slots, sorted elements, exchanged bytes, dropped-slot audit — then converts
them to modeled per-chip stage times with the machine ceilings measured on
one v5e chip (PERF.md "Measured TPU facts" + langsplat4d/utils/roofline.py):

  sort   0.6 ns/element/column          (variadic in-pipeline sort)
  gather 3 ns/row                       (locality-friendly row gather)
  HBM    819 GB/s                       (on-chip stream traffic)
  ICI    LS4D_ICI_GBPS (default 180)    (per-chip interconnect; v5e public
                                         spec: 4 links x 400 Gbps/year-2023
                                         marketing — treat as +-2x and
                                         override via the env var)

Output: one JSON line per (exchange, D) with the raw counts and modeled ms,
suitable for committing under bench_sweeps/.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/model_scatter_scaling.py [N]
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SORT_NS = 0.6
# emission compute (rect tests, ellipse cull, tier gathers) per CANDIDATE
# slot: the measured ts=32 pairs+sort stage (4.98 ms at 1.17M emitted,
# bench_sweeps/r4_profile_stream.json) minus its sort share (0.6 ns x 1.17M
# = 0.7 ms) -> ~3.7 ns/slot. Emission is the term that does NOT scale in
# the all-gather band build (every chip scans all N Gaussians' candidate
# slots; the band restrict only invalidates) but DOES in the scatter build
# (each chip emits its N/D shard only).
EMIT_NS = 3.7
GATHER_NS = 3.0
HBM_BPS = 819e9
ICI_BPS = float(os.getenv("LS4D_ICI_GBPS", "180")) * 1e9
PW_BYTES = 64          # packed attribute row (16 x f32)
SLOT_BYTES = 68        # key u32 + packed row


def main():
    from langsplat4d.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from langsplat4d.core.transforms import (projection_matrix,
                                             safe_normalize, world_to_view)
    from langsplat4d.render.raster import CameraParams, RasterSettings, \
        preprocess
    from langsplat4d.render.stream import (RANK_BITS, _narrow_sorted_pairs,
                                           autotune_tiers,
                                           narrow_valid_count)
    from langsplat4d.parallel.render import shard_tiers
    from langsplat4d.utils.synth import realistic_gaussians

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    H, W = 1014, 1352
    lang_dim = 3
    gs = realistic_gaussians(n, lang_dim=lang_dim, seed=0)

    Rm = np.eye(3)
    T = np.array([0.0, 0.0, 4.5])
    wv = world_to_view(Rm, T).T
    proj = projection_matrix(0.01, 100.0, 1.0, 0.8).T
    cam = CameraParams(
        viewmatrix=jnp.asarray(wv), projmatrix=jnp.asarray(wv @ proj),
        campos=jnp.asarray(np.linalg.inv(wv)[3, :3]),
        tanfovx=jnp.asarray(np.tan(0.5), jnp.float32),
        tanfovy=jnp.asarray(np.tan(0.4), jnp.float32))
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3, lang_dim=lang_dim,
        include_feature=True, stream_binning=True, tile_size=32)
    cap = gs.capacity
    prep = jax.jit(lambda: preprocess(
        settings, cam, gs.xyz, jnp.zeros((cap, 2)),
        jax.nn.sigmoid(gs.opacity), jnp.exp(gs.scaling),
        safe_normalize(gs.rotation), None,
        colors_precomp=jnp.zeros((cap, 3)), active=gs.active_mask()))()

    rmin = np.asarray(prep["rect_min"]); rmax = np.asarray(prep["rect_max"])
    vism = np.asarray(prep["visible"])
    spans = np.maximum((rmax[:, 0] - rmin[:, 0])[vism],
                       (rmax[:, 1] - rmin[:, 1])[vism])
    tiers = autotune_tiers(spans)
    valid = int(jax.jit(lambda p: narrow_valid_count(
        settings, p, tiers=tiers))(prep))

    # exact per-shard emission + per-(src, dst) segment sizes: run the
    # shard-local emission for each shard's row range and partition its
    # sorted keys by destination band (the scatter build's step 3-4, here
    # sequentially so ANY D fits the host)
    tiles_x, tiles_y = settings.tiles_x, settings.tiles_y
    emitted_full = 4 * cap
    prev = 2
    for s, c in tiers:
        emitted_full += (s * s - prev * prev) * min(c, cap)
        prev = s

    big = np.where(np.asarray(prep["visible"]),
                   np.asarray(prep["depth"]), np.inf)
    dorder = np.argsort(big)
    rank_full = np.zeros(cap, np.uint32)
    rank_full[dorder] = np.arange(cap, dtype=np.uint32)

    for d in (1, 2, 4, 8):
        band_rows = -(-tiles_y // d)
        band_tiles = band_rows * tiles_x
        n_loc = cap // d
        st = shard_tiers(tiers, d)
        emitted_loc = 4 * n_loc
        prev = 2
        for s, c in st:
            emitted_loc += (s * s - prev * prev) * min(c, n_loc)
            prev = s

        seg_max = 0
        slots_band = np.zeros(d, np.int64)
        for c in range(d):
            sl = slice(c * n_loc, (c + 1) * n_loc)
            prep_loc = {k: v[sl] for k, v in prep.items()}
            ks, _, nv, _ = jax.jit(lambda p, r: _narrow_sorted_pairs(
                settings, p, jnp.arange(n_loc, dtype=jnp.int32),
                tiers=st, ellipse_cull=True, rank=r))(
                    prep_loc, jnp.asarray(rank_full[sl]))
            ks = np.asarray(ks)
            bnds = (np.arange(d + 1, dtype=np.uint64)
                    * band_tiles) << RANK_BITS
            starts = np.searchsorted(ks, bnds.astype(np.uint32))
            segs = np.diff(starts)
            seg_max = max(seg_max, int(segs.max()))
            slots_band += segs

        bucket = -(-seg_max // 512) * 512
        recv = d * bucket                      # owner-side merge size
        # ---- modeled per-chip stage times (ms) ----
        scatter = {
            "emit_ms": emitted_loc * EMIT_NS * 1e-6,
            "sort_ms": emitted_loc * SORT_NS * 1e-6,
            "row_gather_ms": (d * bucket) * GATHER_NS * 1e-6,
            "exchange_ms": (d - 1) / d * recv * SLOT_BYTES / ICI_BPS * 1e3,
            "merge_sort_ms": recv * 2 * SORT_NS * 1e-6,
        }
        allgather = {
            "gather_ms": ((d - 1) / d * cap * PW_BYTES / ICI_BPS * 1e3
                          if d > 1 else 0.0),
            # band emission scans ALL N Gaussians' candidate slots on every
            # chip (the band restrict only invalidates); only the band's
            # slots survive to the sort
            "emit_ms": emitted_full * EMIT_NS * 1e-6,
            "sort_ms": (emitted_full / d) * SORT_NS * 1e-6,
            "band_gather_ms": (valid / d) * 1.2 * GATHER_NS * 1e-6,
        }
        print(json.dumps({
            "d": d, "tile_size": 32, "n": cap,
            "valid_slots": valid, "emitted_full": emitted_full,
            "per_chip": {
                "scatter": {k: round(v, 3) for k, v in scatter.items()}
                | {"total_ms": round(sum(scatter.values()), 3),
                   "emitted_loc": emitted_loc, "bucket": bucket,
                   "recv_slots": recv,
                   "exchange_mb": round(recv * SLOT_BYTES / 1e6, 2)},
                "allgather": {k: round(v, 3) for k, v in allgather.items()}
                | {"total_ms": round(sum(allgather.values()), 3),
                   "gather_mb": round((d - 1) / d * cap * PW_BYTES / 1e6
                                      if d > 1 else 0.0, 2)},
            }}), flush=True)


if __name__ == "__main__":
    main()
