#!/usr/bin/env python
"""Per-stage render profiling at bench settings on the real chip.

Methodology (PERF.md "tunnel sync latency"): launch all input-varied reps,
block once at the end — per-rep host syncs over-report by ~35 ms.

Usage: python scripts/profile_stages.py [stage ...]
Stages: deform preprocess bin_cells bin_tiles pack composite frame
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene():
    import jax
    import jax.numpy as jnp
    from langsplat4d.core import state as statelib
    from langsplat4d.core.transforms import projection_matrix, world_to_view
    from langsplat4d.field.deformation import DeformConfig, init_deform_params
    from langsplat4d.render.raster import CameraParams, RasterSettings

    H, W = 1014, 1352
    n = int(os.getenv("BENCH_N", 200_000))
    lang_dim = 3
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    cap = statelib.round_capacity(n)
    gs = statelib.create_from_pcd(pts, cols, max_sh_degree=3,
                                  lang_dim=lang_dim, capacity=cap)
    scaling = np.full((cap, 3), np.log(0.01), np.float32)
    lang = rng.normal(size=(cap, lang_dim)).astype(np.float32)
    gs = gs.replace(scaling=jnp.asarray(scaling),
                    language_feature=jnp.asarray(lang))
    # Neu3D flagship preset — keep in sync with bench.py
    dcfg = DeformConfig(
        lang_dim=lang_dim, no_dlang=False, kplanes_out_dim=16,
        kplanes_resolution=(64, 64, 64, 150), multires=(1, 2), net_width=128,
        defor_depth=0, no_do=False, no_dshs=False, no_ds=False)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = jnp.asarray([[1.6] * 3, [-1.6] * 3], jnp.float32)
    Rm = np.eye(3)
    T = np.array([0.0, 0.0, 4.0])
    wv = world_to_view(Rm, T).T
    proj = projection_matrix(0.01, 100.0, 1.0, 0.8).T
    cam = CameraParams(
        viewmatrix=jnp.asarray(wv), projmatrix=jnp.asarray(wv @ proj),
        campos=jnp.asarray(np.linalg.inv(wv)[3, :3]),
        tanfovx=jnp.asarray(np.tan(0.5), jnp.float32),
        tanfovy=jnp.asarray(np.tan(0.4), jnp.float32))
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3, lang_dim=lang_dim,
        include_feature=True,
        tile_capacity=int(os.getenv("BENCH_TILE_CAP", 512)),
        pallas_composite=jax.default_backend() == "tpu")
    return gs, dcfg, dparams, aabb, cam, settings


def timeit(name, fn, args_fn, reps=20):
    """fn jitted; args_fn(i) -> args tuple (device-resident, input-varied)."""
    import jax
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    outs = []
    t0 = time.time()
    for i in range(reps):
        outs.append(fn(*args_fn(i)))
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:20s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from langsplat4d.field.deformation import deform_forward
    from langsplat4d.core.transforms import safe_normalize
    from langsplat4d.render import raster as R
    from langsplat4d.ops.tile_composite import (composite_tiles_pallas,
                                                pack_rows)

    which = set(sys.argv[1:]) or {
        "deform", "preprocess", "bin_cells", "bin_tiles", "pack",
        "composite", "frame"}
    gs, dcfg, dparams, aabb, cam, settings = bench_scene()
    n = gs.capacity
    shs = gs.get_features()
    times = jnp.full((n, 1), 0.3, jnp.float32)

    # --- deformation ---
    import dataclasses
    from langsplat4d.field.deformation import make_grid_spatial_cache
    sd = dataclasses.replace(dcfg, use_discrete_lang_f=False)
    grid_spatial = jax.jit(make_grid_spatial_cache, static_argnums=(1,))(
        dparams, sd, aabb, gs.xyz)

    @jax.jit
    def f_deform(t, xyz):
        return deform_forward(dparams, sd, aabb, xyz, gs.scaling,
                              gs.rotation, gs.opacity, shs,
                              safe_normalize(gs.language_feature), t,
                              grid_spatial=grid_spatial)

    if "deform" in which:
        timeit("deform", f_deform,
               lambda i: (times + i * 1e-5, gs.xyz))

    # deformed attrs for the downstream stages (fixed)
    dm, dsc, drot, dop, dsh, dlang, _ = f_deform(times, gs.xyz)
    dm, dsc, drot, dop, dsh, dlang = jax.block_until_ready(
        (dm, dsc, drot, dop, dsh, dlang))
    scales_act = jnp.exp(dsc)
    rot_act = safe_normalize(drot)
    op_act = jax.nn.sigmoid(dop)
    active = gs.active_mask()
    zeros2 = jnp.zeros((n, 2), jnp.float32)

    @jax.jit
    def f_prep(m3d):
        return R.preprocess(settings, cam, m3d, zeros2, op_act, scales_act,
                            rot_act, dsh, None, active=active)

    if "preprocess" in which:
        timeit("preprocess", f_prep, lambda i: (dm + i * 1e-6,))

    prep = jax.block_until_ready(f_prep(dm))

    @jax.jit
    def f_cells(depth):
        p = dict(prep, depth=depth)
        return R.bin_cells(settings, p)

    if "bin_cells" in which:
        timeit("bin_cells", f_cells, lambda i: (prep["depth"] + i * 1e-6,))

    @jax.jit
    def f_tiles(depth):
        p = dict(prep, depth=depth)
        return R.bin_tiles(settings, p)

    if "bin_tiles" in which:
        timeit("bin_tiles(full)", f_tiles,
               lambda i: (prep["depth"] + i * 1e-6,))

    entries, valid = jax.block_until_ready(f_tiles(prep["depth"]))

    @jax.jit
    def f_pack(colors):
        p = dict(prep, colors=colors)
        rows, _ = pack_rows(p, entries, valid, dlang)
        counts = valid.sum(axis=1, dtype=jnp.int32)
        tb = settings.pallas_tile_block
        pad = (-settings.num_tiles) % tb
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0), (0, 0)))
            counts = jnp.pad(counts, (0, pad))
        return rows, counts

    if "pack" in which:
        timeit("pack_rows", f_pack, lambda i: (prep["colors"] + i * 1e-6,))

    rows, counts = jax.block_until_ready(f_pack(prep["colors"]))
    bg = jnp.zeros(3)

    @jax.jit
    def f_comp(rows):
        return composite_tiles_pallas(
            rows, bg, tiles_x=settings.tiles_x, tile_size=settings.tile_size,
            tb=settings.pallas_tile_block,
            g=min(settings.composite_chunk, settings.tile_capacity),
            hard_cutoffs=True, counts=counts)

    if "composite" in which:
        timeit("composite(pallas)", f_comp, lambda i: (rows + i * 1e-6,))

    if "frame" in which:
        from langsplat4d.render.pipeline import render

        @jax.jit
        def f_frame(t):
            out = render(settings, dcfg, "fine-lang", cam, t, gs, dparams,
                         aabb, bg, grid_spatial=grid_spatial)
            return out["render"], out["language_feature_image"]

        timeit("full frame", f_frame,
               lambda i: (jnp.asarray(i / 60.0),), reps=40)


if __name__ == "__main__":
    main()
