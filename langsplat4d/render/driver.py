"""Render driver: render train/test/video splits in rgb or lang mode, save
PNG/raw-npy/mp4, print the FPS line (reference render.py:67-161).
"""
from __future__ import annotations

import os
import time as time_mod
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from langsplat4d.config import Config
from langsplat4d.data.scene import Scene
from langsplat4d.field.deformation import DeformConfig
from langsplat4d.render.pipeline import render
from langsplat4d.render.raster import RasterSettings
from langsplat4d.train.trainstate import TrainState
from langsplat4d.utils.logging import get_logger

logger = get_logger()

to8b = lambda x: (255 * np.clip(x, 0, 1)).astype(np.uint8)  # noqa: E731


def pca_compress(feature_map: np.ndarray) -> np.ndarray:
    """[C>3,H,W] -> [3,H,W] PCA visualization (render.py:52-65)."""
    from sklearn.decomposition import PCA
    c, h, w = feature_map.shape
    flat = feature_map.transpose(1, 2, 0).reshape(-1, c)
    pca = PCA(n_components=3)
    out = pca.fit_transform(flat).reshape(h, w, 3)
    out = (out - out.min()) / (out.max() - out.min())
    return out.transpose(2, 0, 1)


def _write_images(images: List[np.ndarray], path: str) -> None:
    from PIL import Image

    def write_one(i, img):
        arr = to8b(img).transpose(1, 2, 0)
        if arr.shape[2] == 1:
            arr = arr[:, :, 0]
        Image.fromarray(arr).save(os.path.join(path, f"{i:05d}.png"))

    with ThreadPoolExecutor() as ex:
        list(ex.map(lambda t: write_one(*t), enumerate(images)))


def _make_render_one(settings, dcfg, load_stage, cfg, gs, deform, aabb, bg,
                     grid_spatial, mode, band_cfg=None):
    """Jitted single-frame + chunked multi-frame render closures (rebuilt
    when tiers are retuned).

    The chunk variant maps the frame body over a stacked [B] batch of
    cameras inside ONE dispatch: each host dispatch costs ~30 ms over the
    axon tunnel, so per-frame dispatching caps the FPS line at ~33 even
    with zero device time; lax.map amortizes it B-fold while keeping
    per-frame device semantics (sequential scan, no batch dim in the
    rasterizer).

    `band_cfg` = {mesh, tiers, budget}: route frames through the tile-band
    multi-chip renderer (parallel/render.py) instead of the single-chip
    pipeline — gs/grid_spatial arrive gauss-row-sharded from render_set."""
    key = "render" if mode == "rgb" else "language_feature_image"

    if band_cfg is not None:
        from langsplat4d.parallel.render import render_frame_banded

        def body(camp, t):
            out = render_frame_banded(
                settings, dcfg, load_stage, camp, t, gs, deform, aabb, bg,
                band_cfg["mesh"], tiers=band_cfg["tiers"],
                budget=band_cfg["budget"],
                nonormalized=cfg.runtime.nonormalized,
                grid_spatial=grid_spatial,
                exchange=band_cfg.get("exchange", "allgather"))
            return out[key]
    else:
        def body(camp, t):
            out = render(settings, dcfg, load_stage, camp, t, gs, deform,
                         aabb, bg, nonormalized=cfg.runtime.nonormalized,
                         grid_spatial=grid_spatial)
            return out[key]

    @jax.jit
    def render_chunk(camps, ts):               # stacked [B] pytree / [B]
        return jax.lax.map(lambda ct: body(ct[0], ct[1]), (camps, ts))

    return jax.jit(body), render_chunk


def render_set(cfg: Config, state: TrainState, dcfg: DeformConfig,
               scene: Scene, name: str, iteration: int, views,
               mode: str = "rgb", load_stage: str = "fine-lang",
               noimage: bool = False, nonpy: bool = False,
               novideo: bool = False) -> float:
    """Renders one split; returns measured FPS (render.py:95,133-134)."""
    model_path = cfg.model.model_path
    only_eval = cfg.runtime.only_eval
    lf_path = cfg.model.lf_path
    data_type = scene.dataset_type

    save_name = f"{name}_{mode}"
    base = os.path.join(model_path, save_name, f"ours_{iteration}")
    render_path = os.path.join(base, "renders")
    gts_path = os.path.join(base, "gt")
    render_npy_path = os.path.join(base, "renders_npy")
    gts_npy_path = os.path.join(base, "gt_npy")
    for p in (render_path, gts_path, render_npy_path, gts_npy_path):
        os.makedirs(p, exist_ok=True)

    first = views[0]
    # LS4D_STREAM_BINNING=0: force the pure-XLA padded-tile-list compositor
    # on TPU too. Escape hatch for environments where the Mosaic (Pallas)
    # remote compile is broken/wedged (observed on the axon tunnel: a toy
    # pallas_call compile hangs >400 s while plain XLA compiles in 2 s) —
    # honest lower FPS beats a bench that never finishes compiling.
    on_tpu_stream = (jax.default_backend() == "tpu"
                     and os.environ.get("LS4D_STREAM_BINNING", "1") != "0")
    settings = RasterSettings(
        image_height=first.height, image_width=first.width,
        sh_degree=state.active_sh_degree,
        lang_dim=dcfg.lang_dim,
        include_feature="base" not in load_stage,
        tile_size=(cfg.runtime.render_tile_size if on_tpu_stream
                   else cfg.runtime.tile_size),
        tile_capacity=cfg.runtime.tile_capacity,
        # stream duplicate+sort binning + ragged-segment Pallas compositing
        # (TPU only; CPU keeps the golden-tested jnp path)
        stream_binning=on_tpu_stream,
        # A/B knob: Morton row-table order in the narrow build (locality of
        # the budgeted gather vs one argsort + inverse scatter of build
        # cost). Measured on the trained-checkpoint-realistic Neu3D-scale
        # scene: 27.0 FPS without vs 24.4 with — the reorder costs more than
        # the gather locality buys at 200k Gaussians, so OFF is the default.
        stream_morton=os.environ.get("LS4D_STREAM_MORTON", "0") == "1",
        # A/B knob: single-column key sort + rank-ordered table (default;
        # PERF.md round 4) vs the legacy (key, src) 2-column sort
        stream_single_key=os.environ.get("LS4D_STREAM_SINGLE_KEY",
                                         "1") != "0")
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    gs = state.gaussians()
    deform = state.params["deform"]
    aabb = state.aabb

    # The Gaussian set is fixed across the trajectory, so the HexPlane's
    # time-independent spatial-plane products are computed once and reused by
    # every frame (halves the per-frame grid gathers).
    from langsplat4d.field.deformation import make_grid_spatial_cache
    grid_spatial = None
    if load_stage.startswith("fine"):
        grid_spatial = jax.jit(make_grid_spatial_cache,
                               static_argnums=(1,))(deform, dcfg, aabb, gs.xyz)

    render_one, render_chunk = _make_render_one(
        settings, dcfg, load_stage, cfg, gs, deform, aabb, bg, grid_spatial,
        mode)

    logger.info(f"name:{name} point nums:{int(state.num_active)} "
                f"len:{len(views)}")

    if settings.stream_binning:
        # Autotune the stream tiers from the scene's measured span
        # distribution BEFORE compiling the hot loop: the CUDA reference
        # sizes its duplicate+sort buffers dynamically per frame; the XLA
        # analogue is a once-per-scene retune (host sync + recompile here,
        # zero cost in the timed loop) that guarantees every Gaussian a
        # tier covering its full rect — exact on any scene, not only ones
        # whose span distribution matches the static defaults.
        import dataclasses
        from langsplat4d.core.transforms import safe_normalize
        from langsplat4d.render.stream import (autotune_tiers,
                                               narrow_valid_count,
                                               stream_overflow)
        from langsplat4d.render.raster import preprocess
        try:
            # canonical (undeformed) attributes approximate the deformed
            # span distribution; autotune margins absorb the difference
            prep = preprocess(
                settings, views[0].camera_params(), gs.xyz,
                jnp.zeros((gs.capacity, 2)), jax.nn.sigmoid(gs.opacity),
                jnp.exp(gs.scaling), safe_normalize(gs.rotation), None,
                colors_precomp=jnp.zeros((gs.capacity, 3)),
                active=gs.active_mask())
            rmin = np.asarray(prep["rect_min"])
            rmax = np.asarray(prep["rect_max"])
            vism = np.asarray(prep["visible"])
            sx = (rmax[:, 0] - rmin[:, 0])[vism]
            sy = (rmax[:, 1] - rmin[:, 1])[vism]
            spans = np.maximum(sx, sy)
            tiers = autotune_tiers(spans)
            # beyond 2^18 capacity / 2^14 tiles the narrow build
            # self-switches to the two-column wide key (render/stream.py),
            # so the fast path now covers the reference's full 360k
            # operating range (train.py:399) up to the 2^24 f32-exact cap
            narrow = (gs.capacity < (1 << 24)
                      and settings.num_tiles < (1 << 24)
                      and os.environ.get("LS4D_STREAM_NARROW", "1") != "0")
            budget = 0
            if narrow:
                # size the narrow-sort row budget from the exact VALID slot
                # count (rect-clipped + ellipse-culled) — the rect pair
                # count over-provisions the gather ~2x. Sampled over several
                # views (canonical, undeformed attributes); the 1.2 margin
                # absorbs deformation-induced span drift on top.
                count_fn = jax.jit(
                    lambda p: narrow_valid_count(
                        settings, p, tiers=tiers,
                        ellipse_cull=settings.stream_ellipse_cull))
                n_est = int(count_fn(prep))
                sample_idx = sorted({len(views) // 2, len(views) - 1})
                for v in (views[i] for i in sample_idx if i > 0):
                    p_v = preprocess(
                        settings, v.camera_params(), gs.xyz,
                        jnp.zeros((gs.capacity, 2)),
                        jax.nn.sigmoid(gs.opacity), jnp.exp(gs.scaling),
                        safe_normalize(gs.rotation), None,
                        colors_precomp=jnp.zeros((gs.capacity, 3)),
                        active=gs.active_mask())
                    n_est = max(n_est, int(count_fn(p_v)))
                budget = -(-int(n_est * 1.2) // 8192) * 8192
            if (tiers != settings.stream_tiers
                    or (narrow and not settings.stream_narrow_sort)):
                logger.info(
                    f"stream tiers autotuned to {tiers} (span p100="
                    f"{int(spans.max()) if spans.size else 0}, "
                    f"narrow={narrow} budget={budget})")
                settings = dataclasses.replace(
                    settings, stream_tiers=tiers,
                    stream_narrow_sort=narrow,
                    stream_budget=budget if narrow else 0)
                render_one, render_chunk = _make_render_one(
                    settings, dcfg, load_stage, cfg, gs, deform, aabb, bg,
                    grid_spatial, mode)
            # safety net: the autotuned ladder must not clip (deformation
            # can shift spans slightly; margins should absorb it)
            ov = stream_overflow(settings, prep, tiers=settings.stream_tiers)
            for i, (span, cap) in enumerate(settings.stream_tiers):
                need = int(ov[f"tier{i + 2}_needed"])
                if need > cap:
                    logger.warning(
                        f"stream tier {i + 2} (span {span}) demand {need} > "
                        f"capacity {cap}: the largest Gaussians render with "
                        "clipped tile coverage. Raise stream_tiers.")
            if int(ov["span_exceeded"]) > 0:
                logger.warning(
                    f"{int(ov['span_exceeded'])} Gaussians span beyond the "
                    f"last stream tier ({settings.stream_tiers[-1][0]} "
                    "tiles); raise stream_tiers for exact rendering.")
        except Exception as e:  # diagnostics must never break rendering
            logger.warning(f"stream tier autotune skipped: {e}")

    # ---- tile-band multi-chip rendering (runtime.gaussian_shards > 1) ----
    # Each device narrow-builds + composites its own band of tile rows
    # (uneven splits pad), after either ONE all-gather of the per-Gaussian
    # attributes (default) or, with LS4D_BAND_EXCHANGE=alltoall, a
    # shard-local emission + ONE slot all-to-all (parallel/render.py);
    # falls back to single-chip with a warning when preconditions fail.
    shards = cfg.runtime.gaussian_shards
    if shards > 1:
        try:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from langsplat4d.core.transforms import safe_normalize
            from langsplat4d.parallel.mesh import GAUSS_AXIS, make_mesh
            from langsplat4d.render.raster import preprocess
            from langsplat4d.render.stream import (_narrow_sorted_pairs,
                                                   autotune_tiers)
            if (jax.default_backend() != "tpu"
                    and os.environ.get("LS4D_FORCE_BAND", "0") != "1"):
                raise ValueError(
                    "tile-band rendering needs the TPU backend (its pallas "
                    "composite; set LS4D_FORCE_BAND=1 under interpret mode)")
            if len(jax.devices()) < shards:
                raise ValueError(
                    f"gaussian_shards={shards} but only "
                    f"{len(jax.devices())} devices visible")
            mesh = make_mesh(shards, data=1, gauss=shards)
            prep = preprocess(
                settings, views[0].camera_params(), gs.xyz,
                jnp.zeros((gs.capacity, 2)), jax.nn.sigmoid(gs.opacity),
                jnp.exp(gs.scaling), safe_normalize(gs.rotation), None,
                colors_precomp=jnp.zeros((gs.capacity, 3)),
                active=gs.active_mask())
            rmin = np.asarray(prep["rect_min"])
            rmax = np.asarray(prep["rect_max"])
            vism = np.asarray(prep["visible"])
            spans = np.maximum((rmax[:, 0] - rmin[:, 0])[vism],
                               (rmax[:, 1] - rmin[:, 1])[vism])
            tiers = autotune_tiers(spans)
            # EXACT per-band demand (the band sorts are independent, so the
            # budget is sized by the worst band, not total/D); bands pad
            # over uneven tile-row splits
            band_rows = -(-settings.tiles_y // shards)
            ids = jnp.arange(gs.capacity, dtype=jnp.int32)
            count_band = jax.jit(lambda p, ty0: _narrow_sorted_pairs(
                settings, p, ids, tiers=tiers,
                ellipse_cull=settings.stream_ellipse_cull,
                tile_band=(ty0, band_rows))[2])
            n_band = max(
                int(count_band(prep, jnp.asarray(b * band_rows, jnp.int32)))
                for b in range(shards))
            budget = max(8192, -(-int(n_band * 1.3) // 8192) * 8192)
            # exchange=alltoall: per-chip tile ownership + ONE slot
            # all-to-all (parallel/render.py render_tiles_scatter); budget
            # is then the per-(src, dst) bucket — worst-band demand split
            # over src chips with a 2x shard-skew margin
            exchange = os.environ.get("LS4D_BAND_EXCHANGE", "allgather")
            if exchange == "alltoall":
                budget = max(512,
                             -(-int(n_band * 2.0) // (512 * shards)) * 512)
            # row-shard the per-Gaussian state (+ the spatial-plane cache)
            # so deformation/preprocess stay shard-local
            row = NamedSharding(mesh, P(GAUSS_AXIS))

            def place_rows(x):
                if (hasattr(x, "ndim") and x.ndim >= 1
                        and x.shape[0] == gs.capacity):
                    return jax.device_put(x, row)
                return x

            gs = jax.tree.map(place_rows, gs)
            if grid_spatial is not None:
                grid_spatial = jax.tree.map(place_rows, grid_spatial)
            band_cfg = dict(mesh=mesh, tiers=tiers, budget=budget,
                            exchange=exchange)
            render_one, render_chunk = _make_render_one(
                settings, dcfg, load_stage, cfg, gs, deform, aabb, bg,
                grid_spatial, mode, band_cfg=band_cfg)
            logger.info(
                f"tile-band multi-chip render ({exchange}): {shards} bands "
                f"of {band_rows} tile rows, tiers={tiers}, budget "
                f"{budget} (worst-band demand {n_band})")
        except Exception as e:
            logger.warning(f"tile-band multi-chip render disabled: {e}")

    # warm-up: compile outside the timed region (the CUDA reference has no
    # compile step; the FPS line measures steady-state throughput). Frames
    # go through render_chunk in fixed-size batches (one compile total);
    # a trailing partial batch is padded with the last view and sliced off.
    # default 20: the round-5 chunk sweep on a latency-degraded tunnel
    # measured 13.9 / 37.3 / 35.8 / 29.0 FPS at chunk 10/20/30/60
    # (bench_sweeps/r5_sweep/render_chunk*.out) — dispatch+upload cost per
    # chunk dominates below 20, lax.map working-set pressure wins above 30.
    # On the round-4 healthy tunnel chunk=10 already amortized fully, so 20
    # is neutral there; device memory cost is chunk x ~22 MB of frames.
    chunk_b = max(1, min(int(os.environ.get("LS4D_RENDER_CHUNK", "20")),
                         len(views)))

    def stack_views(vs):
        camps = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[v.camera_params() for v in vs])
        ts = jnp.asarray([v.time for v in vs], jnp.float32)
        return camps, ts

    n_views = len(views)
    warm_views = [views[i] for i in range(min(chunk_b, n_views))]
    warm_views += [warm_views[-1]] * (chunk_b - len(warm_views))
    _ = jax.block_until_ready(render_chunk(*stack_views(warm_views)))

    gt_nonorm_list: List[Optional[np.ndarray]] = []
    gt_list: List[Optional[np.ndarray]] = []
    tosave_rendering: List[np.ndarray] = []
    render_images: List[np.ndarray] = []

    # Pipelined frame loop: dispatch chunk_b-frame batches, then force the
    # LAST frame by value — the in-order device queue drains all prior
    # chunks before it completes, so the timed window covers all compute
    # while paying the ~30 ms tunnel dispatch cost once per CHUNK instead of
    # once per frame (PERF.md). The reference loop also keeps frames
    # on-device inside its timed window (render.py:95-126 appends CUDA
    # tensors; saving happens after :133).
    device_chunks = []
    time1 = time_mod.time()
    for c0 in range(0, n_views, chunk_b):
        # index one by one: lazy dataset wrappers don't support slices
        vs = [views[i] for i in range(c0, min(c0 + chunk_b, n_views))]
        n_real = len(vs)
        if n_real < chunk_b:                      # pad the trailing batch
            vs = vs + [vs[-1]] * (chunk_b - n_real)
        device_chunks.append((render_chunk(*stack_views(vs)), n_real))
    if device_chunks:
        # value fetch, not block_until_ready: the axon runtime defers
        # execution until a value is pulled (PERF.md)
        assert np.isfinite(float(device_chunks[-1][0][0, 0, 0, 0]))
    time2 = time_mod.time()
    fps = (len(views) - 1) / max(time2 - time1, 1e-9)
    print("FPS:", fps)

    # drain device -> host outside the timed window (frames are complete;
    # this is pure transfer), freeing device memory as we go
    render_list: List[np.ndarray] = []
    for i in range(len(device_chunks)):
        chunk, n_real = device_chunks[i]
        host = np.asarray(chunk)
        render_list.extend(host[j] for j in range(n_real))
        device_chunks[i] = None

    for idx, view in enumerate(views):
        rendering = render_list[idx]
        if mode == "rgb":
            gt = view.image[:3] if view.image is not None else None
            gt_nonorm_list.append(gt)
        else:
            if only_eval or lf_path is None:
                gt = None
                gt_nonorm_list.append(gt)
            else:
                gt, _mask = view.get_language_feature(
                    lf_path, cfg.model.feature_level, split=name,
                    data_type=data_type)
                gt_nonorm_list.append(gt)
                if gt is not None and (data_type != "dynerf"
                                       or name != "video"):
                    gt = (gt + 1.0) / 2
            rendering = (rendering + 1.0) / 2
            if rendering.shape[0] > 3:
                rendering = pca_compress(rendering)
                gt = pca_compress(gt) if gt is not None else None
        gt_list.append(gt)
        tosave_rendering.append(rendering)
        render_images.append(to8b(rendering).transpose(1, 2, 0))

    if not noimage:
        if gt_list and gt_list[0] is not None:
            _write_images([g for g in gt_list if g is not None], gts_path)
        _write_images(tosave_rendering, render_path)

    if not nonpy:
        for idx in range(len(render_list)):
            np.save(os.path.join(render_npy_path, f"{idx:05d}.npy"),
                    render_list[idx].transpose(1, 2, 0))
            if gt_nonorm_list[idx] is not None:
                np.save(os.path.join(gts_npy_path, f"{idx:05d}.npy"),
                        gt_nonorm_list[idx].transpose(1, 2, 0))

    if not novideo:
        import imageio
        try:
            imageio.mimwrite(os.path.join(base, f"video_{mode}.mp4"),
                             render_images, fps=30)
        except (ValueError, ImportError) as e:
            # No ffmpeg/pyav backend available: frames are already on disk as
            # PNGs, so degrade to a warning instead of failing the render run.
            print(f"[render] skipping video_{mode}.mp4 (no mp4 backend: {e})")
    return fps
