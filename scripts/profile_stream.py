#!/usr/bin/env python
"""Per-stage profiling of the NARROW-SORT STREAM render path on the
trained-checkpoint-realistic bench scene (the bench.py workload).

Stages: deform -> preprocess -> narrow pairs (emission + key sort) ->
budgeted row gather -> stream composite; plus the full frame.

Methodology (PERF.md): warm up with a value fetch, launch all input-varied
reps, force the last output BY VALUE (the axon runtime defers execution
until a value is pulled; block_until_ready alone under-reports).

Usage: python scripts/profile_stream.py [stage ...]
Stages: deform preprocess pairs gather composite frame
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, args_fn, reps=20):
    out = fn(*args_fn(0))
    leaf = jax_first_leaf(out)
    assert np.isfinite(float(leaf)), name   # value-forced warmup
    outs = None
    t0 = time.time()
    for i in range(reps):
        outs = fn(*args_fn(i))
    assert np.isfinite(float(jax_first_leaf(outs)))
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:22s} {dt:8.2f} ms", flush=True)
    return dt


def jax_first_leaf(out):
    import jax
    leaves = jax.tree.leaves(out)
    x = leaves[0]
    return x.reshape(-1)[0] if hasattr(x, "reshape") else x


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
    from langsplat4d.render.stream import (_morton_table_order,
                                           _narrow_sorted_pairs,
                                           autotune_tiers, narrow_valid_count)
    from langsplat4d.utils.synth import realistic_gaussians

    which = set(a for a in sys.argv[1:] if not a.startswith("-")) or {
        "deform", "preprocess", "pairs", "gather", "composite", "frame"}

    H = int(os.getenv("BENCH_H", 1014))
    W = int(os.getenv("BENCH_W", 1352))
    n = int(os.getenv("BENCH_N", 200_000))
    lang_dim = 3
    gs = realistic_gaussians(n, lang_dim=lang_dim, seed=0)
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
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3, lang_dim=lang_dim,
        include_feature=True, stream_binning=True,
        tile_size=int(os.getenv("PROF_TS", "16")),
        composite_chunk=int(os.getenv("PROF_G", "128").split(",")[0]),
        pallas_tile_block=int(os.getenv("PROF_TB", "8").split(",")[0]),
        stream_morton=os.environ.get("LS4D_STREAM_MORTON", "0") == "1")

    cap = gs.capacity
    shs = gs.get_features()
    times = jnp.full((cap, 1), 0.3, jnp.float32)
    grid_spatial = jax.jit(make_grid_spatial_cache, static_argnums=(1,))(
        dparams, dcfg, aabb, gs.xyz)

    @jax.jit
    def f_deform(t, xyz):
        return deform_forward(dparams, dcfg, aabb, xyz, gs.scaling,
                              gs.rotation, gs.opacity, shs,
                              safe_normalize(gs.language_feature), t,
                              grid_spatial=grid_spatial)

    if "deform" in which:
        timeit("deform", f_deform, lambda i: (times + i * 1e-5, gs.xyz))

    dm, dsc, drot, dop, dsh, dlang, _ = f_deform(times, gs.xyz)
    scales_act = jnp.exp(dsc)
    rot_act = safe_normalize(drot)
    op_act = jax.nn.sigmoid(dop)
    active = gs.active_mask()
    zeros2 = jnp.zeros((cap, 2), jnp.float32)

    @jax.jit
    def f_prep(m3d):
        return R.preprocess(settings, cam, m3d, zeros2, op_act, scales_act,
                            rot_act, dsh, None, active=active)

    if "preprocess" in which:
        timeit("preprocess", f_prep, lambda i: (dm + i * 1e-6,))

    prep = f_prep(dm)
    _ = float(prep["depth"][0])

    # autotune exactly as the driver does
    rmin = np.asarray(prep["rect_min"]); rmax = np.asarray(prep["rect_max"])
    vism = np.asarray(prep["visible"])
    spans = np.maximum((rmax[:, 0] - rmin[:, 0])[vism],
                       (rmax[:, 1] - rmin[:, 1])[vism])
    tiers = autotune_tiers(spans)
    n_est = int(jax.jit(lambda p: narrow_valid_count(
        settings, p, tiers=tiers))(prep))
    budget = -(-int(n_est * 1.2) // 8192) * 8192
    import dataclasses
    settings = dataclasses.replace(
        settings, stream_tiers=tiers, stream_narrow_sort=True,
        stream_budget=budget)
    emitted = 4 * cap
    prev = 2
    for s, c in tiers:
        emitted += (s * s - prev * prev) * min(c, cap)
        prev = s
    print(f"tiers={tiers}\nvalid={n_est} budget={budget} "
          f"emitted_slots={emitted}", flush=True)

    use_morton = settings.stream_morton
    single_key = (os.getenv("PROF_SINGLE_KEY", "1") == "1")
    settings = dataclasses.replace(settings, stream_single_key=single_key)
    morder, mpos = _morton_table_order(settings, prep,
                                       use_morton and not single_key)

    @jax.jit
    def f_pairs(depth):
        p = dict(prep, depth=depth)
        return _narrow_sorted_pairs(
            settings, p, mpos, tiers=tiers,
            ellipse_cull=settings.stream_ellipse_cull,
            carry_src=not single_key)

    if "pairs" in which:
        timeit("narrow pairs+sort", f_pairs,
               lambda i: (prep["depth"] + i * 1e-6,))

    k_sorted, s_sorted, n_valid, dorder = f_pairs(prep["depth"])
    _ = int(n_valid)

    PWn = 16
    ln_op = jnp.log(jnp.maximum(prep["opacity"], 1e-30))
    zero = jnp.zeros((cap,), jnp.float32)
    col_list = [
        prep["point_image"][:, 0], prep["point_image"][:, 1],
        prep["conic"][:, 0], prep["conic"][:, 1], prep["conic"][:, 2],
        ln_op, zero, zero,
        prep["colors"][:, 0], prep["colors"][:, 1], prep["colors"][:, 2],
        *[dlang[:, i] for i in range(lang_dim)],
        prep["depth"],
    ]
    col_list += [zero] * (PWn - len(col_list))
    packed = jnp.stack(col_list, axis=1)
    from langsplat4d.render.stream import RANK_CAP
    if single_key:
        @jax.jit
        def f_gather(k_sorted, dorder):
            table = packed[dorder]
            s_b = (k_sorted[:budget] & jnp.uint32(RANK_CAP - 1)).astype(
                jnp.int32)
            return table[s_b].T

        if "gather" in which:
            timeit("rank perm + gather", f_gather,
                   lambda i: (k_sorted, dorder + 0 * i))
    else:
        table = packed[morder] if use_morton else packed

        @jax.jit
        def f_gather(s_sorted):
            s_b = s_sorted[:budget]
            return table[s_b].T

        if "gather" in which:
            timeit("row gather (budget)", f_gather,
                   lambda i: (s_sorted + 0 * i,))

    @jax.jit
    def f_rows(depth):
        """pairs + gather + starts: the whole binning block."""
        p = dict(prep, depth=depth)
        from langsplat4d.render.stream import build_stream_narrow
        return build_stream_narrow(
            settings, p, dlang, tiers=tiers, budget=budget,
            ellipse_cull=settings.stream_ellipse_cull)

    rows, starts, _nv = f_rows(prep["depth"])
    _ = float(rows[0, 0])
    bg = jnp.zeros(3)

    def make_comp(g, tb):
        @jax.jit
        def f_comp(rows, starts):
            return composite_stream_pallas(
                rows, starts, bg, tiles_x=settings.tiles_x,
                num_tiles=settings.num_tiles, tile_size=settings.tile_size,
                tb=tb, g=g, hard_cutoffs=True)
        return f_comp

    if "composite" in which:
        # PROF_G / PROF_TB accept comma-separated sweep lists
        for g in [int(x) for x in os.getenv("PROF_G", "128").split(",")]:
            for tb in [int(x) for x in os.getenv("PROF_TB", "8").split(",")]:
                timeit(f"stream composite g={g} tb={tb}", make_comp(g, tb),
                       lambda i: (rows + i * 1e-6, starts))

    if "frame" in which:
        from langsplat4d.render.pipeline import render

        @jax.jit
        def f_frame(t):
            out = render(settings, dcfg, "fine-lang", cam, t, gs, dparams,
                         aabb, bg, grid_spatial=grid_spatial)
            return out["language_feature_image"]

        timeit("full frame", f_frame, lambda i: (jnp.asarray(i / 60.0),),
               reps=40)


if __name__ == "__main__":
    main()
