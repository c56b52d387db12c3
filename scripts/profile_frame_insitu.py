#!/usr/bin/env python
"""IN-SITU per-stage attribution of the full render frame (VERDICT r4 #4).

profile_stream.py times each stage as a standalone jit with inputs already
materialized in their ideal layouts — its stage-sum (13.2 ms) explains only
half the measured 26.4 ms frame. This script attributes the WHOLE frame by
ablation: it times a ladder of jitted prefixes of the real
render-pipeline frame (each returning a scalar so XLA dead-code-eliminates
everything downstream of the cut), so consecutive deltas are the in-situ
cost of each stage INCLUDING its fusion boundaries, layout conversions and
inter-stage glue. The ladder's top rung is the exact driver frame body, so
the deltas sum to the real frame time by construction.

Ladder (each includes everything above it):
  deform          deformation field forward (+SH/lang heads)
  preprocess      + projection/EWA/culling
  emit+sort       + narrow key emission + u32 sort
  pack+gather     + attribute-table pack, rank permutation, budget gather,
                    searchsorted starts
  composite       + the pallas stream composite over tile segments
  frame           + image stitch (reshape/transpose), normalization, crop —
                    the full pipeline.render body

Methodology per PERF.md: warm up with a value fetch, chain reps with
input-varied args, force the last output BY VALUE.

Usage: python scripts/profile_frame_insitu.py [reps]
Env: BENCH_H/W/N, PROF_TS (tile size), LS4D_STREAM_SINGLE_KEY.
Writes bench_sweeps/r5_frame_insitu.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from langsplat4d.core.transforms import (projection_matrix,
                                             safe_normalize, world_to_view)
    from langsplat4d.field.deformation import (DeformConfig, deform_forward,
                                               init_deform_params,
                                               make_grid_spatial_cache)
    from langsplat4d.ops.tile_composite import composite_stream_pallas
    from langsplat4d.render import raster as R
    from langsplat4d.render.raster import CameraParams, RasterSettings
    from langsplat4d.render.stream import (_narrow_sorted_pairs,
                                           autotune_tiers,
                                           narrow_valid_count,
                                           pack_attribute_table, RANK_CAP)
    from langsplat4d.utils.synth import realistic_gaussians

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    H = int(os.getenv("BENCH_H", 1014))
    W = int(os.getenv("BENCH_W", 1352))
    n = int(os.getenv("BENCH_N", 200_000))
    lang_dim = 3
    gs = realistic_gaussians(n, lang_dim=lang_dim, seed=0)
    cap = gs.capacity
    dcfg = DeformConfig(
        lang_dim=lang_dim, no_dlang=False, kplanes_out_dim=16,
        kplanes_resolution=(64, 64, 64, 150), multires=(1, 2), net_width=128,
        defor_depth=0, no_do=False, no_dshs=False, no_ds=False)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = jnp.asarray([[2.6] * 3, [-2.6] * 3], jnp.float32)

    Rm = np.eye(3)
    T = np.array([0.0, 0.0, 4.5])
    wv = world_to_view(Rm, T).T
    proj = projection_matrix(0.01, 100.0, 1.0, 0.8).T
    cam = CameraParams(
        viewmatrix=jnp.asarray(wv), projmatrix=jnp.asarray(wv @ proj),
        campos=jnp.asarray(np.linalg.inv(wv)[3, :3]),
        tanfovx=jnp.asarray(np.tan(0.5), jnp.float32),
        tanfovy=jnp.asarray(np.tan(0.4), jnp.float32))
    single_key = os.environ.get("LS4D_STREAM_SINGLE_KEY", "1") != "0"
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3, lang_dim=lang_dim,
        include_feature=True, stream_binning=True,
        tile_size=int(os.getenv("PROF_TS", "32")),
        stream_single_key=single_key)

    shs = gs.get_features()
    grid_spatial = jax.jit(make_grid_spatial_cache, static_argnums=(1,))(
        dparams, dcfg, aabb, gs.xyz)
    active = gs.active_mask()
    zeros2 = jnp.zeros((cap, 2), jnp.float32)
    bg = jnp.zeros(3)

    # ---- autotune exactly as the driver does (untimed, once per scene) ----
    def _deform(t):
        tcol = jnp.full((cap, 1), t, jnp.float32)
        return deform_forward(dparams, dcfg, aabb, gs.xyz, gs.scaling,
                              gs.rotation, gs.opacity, shs,
                              safe_normalize(gs.language_feature), tcol,
                              grid_spatial=grid_spatial)

    def _prep(t):
        dm, dsc, drot, dop, dsh, dlang, _ = _deform(t)
        prep = R.preprocess(settings, cam, dm, zeros2, jax.nn.sigmoid(dop),
                            jnp.exp(dsc), safe_normalize(drot), dsh, None,
                            active=active)
        return prep, dlang

    prep0, _ = jax.jit(_prep)(jnp.asarray(0.3))
    rmin = np.asarray(prep0["rect_min"]); rmax = np.asarray(prep0["rect_max"])
    vism = np.asarray(prep0["visible"])
    spans = np.maximum((rmax[:, 0] - rmin[:, 0])[vism],
                       (rmax[:, 1] - rmin[:, 1])[vism])
    tiers = autotune_tiers(spans)
    n_est = int(jax.jit(lambda p: narrow_valid_count(
        settings, p, tiers=tiers))(prep0))
    budget = -(-int(n_est * 1.2) // 8192) * 8192
    print(f"tiers={tiers} valid={n_est} budget={budget} ts="
          f"{settings.tile_size} single_key={single_key}", flush=True)

    wide = cap > RANK_CAP or settings.num_tiles >= (1 << 14)

    # ---- the ladder: jitted prefixes of the real frame ----
    def lad_deform(t):
        out = _deform(t)
        return sum(jnp.sum(x) for x in out[:6])

    def lad_preprocess(t):
        prep, dlang = _prep(t)
        return (jnp.sum(prep["point_image"]) + jnp.sum(prep["conic"])
                + jnp.sum(prep["depth"]) + jnp.sum(prep["colors"])
                + jnp.sum(dlang))

    def _pairs(t):
        prep, dlang = _prep(t)
        k_sorted, s_sorted, _nv, dorder = _narrow_sorted_pairs(
            settings, prep, jnp.arange(cap, dtype=jnp.int32), tiers=tiers,
            ellipse_cull=settings.stream_ellipse_cull,
            carry_src=not single_key, wide=wide)
        return prep, dlang, k_sorted, s_sorted, dorder

    def lad_emit_sort(t):
        _prep_, _dlang, k_sorted, s_sorted, _dorder = _pairs(t)
        out = jnp.sum(k_sorted)
        if s_sorted is not None:
            out = out + jnp.sum(s_sorted)
        return out

    def lad_pack_gather(t):
        prep, dlang, k_sorted, s_sorted, dorder = _pairs(t)
        packed = pack_attribute_table(prep, dlang)
        k_b = k_sorted[:budget]
        if single_key:
            table = packed[dorder]
            if wide:
                s_b = s_sorted[:budget]
            else:
                s_b = (k_b & jnp.uint32(RANK_CAP - 1)).astype(jnp.int32)
        else:
            table = packed
            s_b = s_sorted[:budget]
        rows = table[s_b].T
        bounds = (jnp.arange(settings.num_tiles + 1, dtype=jnp.uint32)
                  if wide else
                  (jnp.arange(settings.num_tiles + 1, dtype=jnp.uint32)
                   << 18))
        starts = jnp.searchsorted(k_b, bounds).astype(jnp.int32)
        return rows, starts

    def lad_pack_gather_s(t):
        rows, starts = lad_pack_gather(t)
        return jnp.sum(rows) + jnp.sum(starts)

    def lad_composite(t):
        rows, starts = lad_pack_gather(t)
        out = composite_stream_pallas(
            rows, starts, bg, tiles_x=settings.tiles_x,
            num_tiles=settings.num_tiles, tile_size=settings.tile_size,
            tb=settings.pallas_tile_block, g=settings.composite_chunk,
            hard_cutoffs=settings.hard_cutoffs)
        return jnp.sum(out)

    def lad_frame(t):
        from langsplat4d.render.pipeline import render
        out = render(settings, dcfg, "fine-lang", cam, t, gs, dparams,
                     aabb, bg, grid_spatial=grid_spatial)
        return jnp.sum(out["language_feature_image"])

    ladder = [("deform", lad_deform), ("preprocess", lad_preprocess),
              ("emit+sort", lad_emit_sort), ("pack+gather", lad_pack_gather_s),
              ("composite", lad_composite), ("frame", lad_frame)]

    results = {}
    for name, fn in ladder:
        jfn = jax.jit(fn)
        out = jfn(jnp.asarray(0.3))
        assert np.isfinite(float(out)), name   # value-forced warmup
        t0 = time.time()
        last = None
        for i in range(reps):
            last = jfn(jnp.asarray(0.3 + i * 1e-5))
        assert np.isfinite(float(last))
        dt = (time.time() - t0) / reps * 1e3
        results[name] = dt
        print(f"{name:14s} cum {dt:8.2f} ms", flush=True)

    print("\nin-situ stage deltas (consecutive ladder differences):")
    names = [n_ for n_, _ in ladder]
    deltas = {}
    prev = 0.0
    for name in names:
        deltas[name] = results[name] - prev
        prev = results[name]
        print(f"{name:14s} {deltas[name]:8.2f} ms", flush=True)

    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_sweeps"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_sweeps",
        "r5_frame_insitu.json")
    with open(out_path, "w") as f:
        json.dump({"cumulative_ms": results, "delta_ms": deltas,
                   "config": {"H": H, "W": W, "n": n,
                              "tile_size": settings.tile_size,
                              "single_key": single_key, "budget": budget,
                              "tiers": list(map(list, tiers)),
                              "reps": reps},
                   "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
                  f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
