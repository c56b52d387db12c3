"""Training drivers: per-stage `scene_reconstruction` loop + the 4/5-stage
curriculum `training` (reference train.py:98-466).

Host-side control (camera sampling, densify scheduling, checkpointing, the
NaN watchdog) wraps the jitted `train_step`; everything per-iteration-hot is
compiled once per stage.
"""
from __future__ import annotations

import os
import random
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from langsplat4d.config import Config
from langsplat4d.core import plyio, state as statelib
from langsplat4d.data.cameras import HostCamera
from langsplat4d.data.scene import BatchLoader, FineSampler, Scene
from langsplat4d.field.deformation import DeformConfig, init_deform_params
from langsplat4d.render.raster import RasterSettings
from langsplat4d.train import densify as D
from langsplat4d.train.optim import LRConfig
from langsplat4d.train.step import (Batch, StepConfig, pack_cam_rows,
                                    train_step, train_step_packed)
from langsplat4d.train.trainstate import TrainState, make_train_state
from langsplat4d.utils.logging import get_logger
from langsplat4d.utils.timer import Timer

logger = get_logger()

STAGE_ORDER = ("coarse-base", "coarse-lang", "fine-base", "fine-lang")


class PackedPayload(tuple):
    """(packed [B,39] np.f32, imgs tuple, segs tuple|None, tables
    tuple|None): the single-upload wire format consumed by
    train_step_packed — camera matrices/time/iteration as ONE host row per
    camera, GT arrays as cached device references. Batch stacking and
    decode happen inside the step's jit (1 upload + 1 dispatch per
    iteration instead of ~10)."""
    __slots__ = ()

    def __new__(cls, packed, imgs, segs, tables):
        return tuple.__new__(cls, (packed, imgs, segs, tables))

    packed = property(lambda s: s[0])
    imgs = property(lambda s: s[1])
    segs = property(lambda s: s[2])
    tables = property(lambda s: s[3])


def payload_to_batch(p: PackedPayload) -> Batch:
    """Eager PackedPayload -> Batch (debug/telemetry cadence only)."""
    from langsplat4d.render.raster import CameraParams
    pk = jnp.asarray(p.packed)
    b = pk.shape[0]
    cams = CameraParams(
        viewmatrix=pk[:, :16].reshape(b, 4, 4),
        projmatrix=pk[:, 16:32].reshape(b, 4, 4),
        campos=pk[:, 32:35], tanfovx=pk[:, 35], tanfovy=pk[:, 36])
    tables = None
    if p.tables:
        s_max = max(t.shape[0] for t in p.tables)
        tables = jnp.stack([
            t if t.shape[0] == s_max
            else jnp.pad(t, ((0, s_max - t.shape[0]), (0, 0)))
            for t in p.tables])
    return Batch(cams=cams, times=pk[:, 37], gt_images=jnp.stack(p.imgs),
                 gt_lang=None, lang_mask=None,
                 gt_seg=jnp.stack(p.segs) if p.segs else None,
                 gt_tables=tables)


def _watchdog_restart(cfg: Config, reason: str) -> None:
    """NaN/explosion recovery: re-exec the process with the same argv
    (reference train.py:341-351). `runtime.watchdog_execv=False` raises
    instead — for harnesses where a restart loop would never terminate.

    Unlike the reference, restarts are CAPPED (LS4D_WATCHDOG_MAX_RESTARTS,
    default 3): training here is deterministic, so a NaN that reproduces on
    every restart would loop forever — after the cap the process raises so
    the failure surfaces instead of burning the machine."""
    if getattr(cfg.runtime, "watchdog_execv", True):
        n = int(os.environ.get("LS4D_WATCHDOG_RESTART_COUNT", "0"))
        cap = int(os.environ.get("LS4D_WATCHDOG_MAX_RESTARTS", "3"))
        if n < cap:
            os.environ["LS4D_WATCHDOG_RESTART_COUNT"] = str(n + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        logger.error(f"watchdog restart cap reached ({n}/{cap}); raising")
    raise RuntimeError(f"training watchdog tripped: {reason}")


def build_batch(cams: List[HostCamera], cfg: Config, scene: Scene,
                split: str = "train", need_lang: bool = True,
                packed_iter=None) -> Batch:
    """Stack a list of host cameras into device Batch arrays.

    With `runtime.compact_batch` (the default) the batch crosses the
    host->device link in the compact wire format — uint8 images plus raw
    (seg-id, feature-table) language GT, decoded/gathered on device by
    `materialize_batch` — because H2D bandwidth over the device tunnel, not
    host decode, bounds full-loop it/s (PERF.md). The uint8 quantization is
    applied only when it is a lossless round-trip of the stacked f32 images
    (always true for u8-decoded PNGs/JPEGs, the reference's only sources —
    utils/general_utils.py PILtoTorch), so both formats feed the step
    identical values.

    With `runtime.gt_cache_mb > 0` (the default) each camera's GT arrays
    stay RESIDENT on device after their first upload (data/gt_cache.py):
    training revisits each camera ~total_iters/n_images times, so after the
    first epoch the only per-iteration host work left is the device-side
    stack of cached arrays. The reference re-uploads every iteration
    (train.py:242-296).

    `packed_iter` (an int iteration) switches the return to PackedPayload —
    per-camera DEVICE refs + one packed host row per camera — consumed by
    train_step_packed in a single dispatch (requires the compact wire
    format for the language channel).
    """
    compact = getattr(cfg.runtime, "compact_batch", True)
    packed_mode = packed_iter is not None
    if packed_mode and need_lang and not compact:
        packed_mode = None  # full-format lang maps: keep the legacy path
        packed_iter = None
    cache = None
    cache_mb = getattr(cfg.runtime, "gt_cache_mb", 0)
    if cache_mb > 0:
        from langsplat4d.data.gt_cache import get_cache, image_fingerprint
        cache = get_cache(cache_mb)
    # camera matrices: stack in numpy. Packed mode defers the upload to
    # train_step_packed's single dispatch; legacy mode uploads once per
    # field — 5 dispatches per batch instead of 5 per camera + 5 stacks
    # (PERF.md: dispatch setup over the device tunnel dominates small-array
    # uploads)
    cam_params = [c.camera_params_np() for c in cams]
    cam_times = [c.time for c in cams]
    if packed_mode:
        packed_rows = pack_cam_rows(cam_params, cam_times, packed_iter)
        stacked = times = None
    else:
        stacked = jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *cam_params)
        times = jnp.asarray(cam_times, jnp.float32)

    # ---- images: per-camera device arrays, cached across revisits ----
    def encode_image(img):
        # u8 when lossless, independent of the wire format — cache entries
        # are shared between compact and full builds (and cost 4x less HBM)
        q = np.rint(img * np.float32(255.0)).astype(np.uint8)
        if np.array_equal(q.astype(np.float32) / np.float32(255.0), img):
            return q
        return np.asarray(img, np.float32)

    def image_key(c):
        # File-backed cameras (pixels are exactly the lazy decode of
        # image_path, never constructor-supplied or mutated) key by file
        # identity: a cache hit then skips the host decode outright — the
        # dominant full-loop host cost (PERF.md). Anything else keys by
        # content fingerprint, so tests/augmentation that mutate `cam.image`
        # still miss instead of being served stale bytes.
        if getattr(c, "image_file_backed", False):
            st = os.stat(c.image_path)
            return ("img", c.image_name, split, c.image_path,
                    st.st_mtime_ns, st.st_size, c.image_resize, c.image_filt)
        return ("img", c.image_name, split, image_fingerprint(c.image))

    imgs_dev = []
    for c in cams:
        if cache is not None:
            key = image_key(c)
            hit = cache.peek(key)
            dev = (hit if hit is not None
                   else cache.put(key, (encode_image(c.image),)))[0]
        else:
            dev = jnp.asarray(encode_image(c.image))
        imgs_dev.append(dev)
    if any(d.dtype == jnp.uint8 for d in imgs_dev) and (
            not compact or any(d.dtype != jnp.uint8 for d in imgs_dev)):
        # full format, or mixed encodings across the batch: decode u8 on
        # device (exact — the same true division materialize_batch performs)
        imgs_dev = [d.astype(jnp.float32) / np.float32(255.0)
                    if d.dtype == jnp.uint8 else d for d in imgs_dev]
    if packed_mode and not need_lang:
        return PackedPayload(packed_rows, tuple(imgs_dev), None, None)
    gt_images = None if packed_mode else jnp.stack(imgs_dev)

    lf_path = cfg.model.lf_path
    lang_dim = cfg.runtime.language_feature_hiddendim
    have_lang = (need_lang and lf_path is not None
                 and os.path.isdir(lf_path))
    if not need_lang:
        # base stages never read the language GT (train.py:283-285): skip
        # the .npy loads and the H2D transfer entirely
        return Batch(cams=stacked, times=times, gt_images=gt_images,
                     gt_lang=None, lang_mask=None)

    def warn_missing(c):
        # zeros turn the lang loss into a silent no-op — warn once so a
        # wrong --language_features_name can't quietly train zero fields
        if not getattr(build_batch, "_warned_missing_lang", False):
            build_batch._warned_missing_lang = True
            logger.warning(
                f"no GT language features found under {lf_path!r} "
                f"(camera {c.image_name}); lang losses will see zeros.")

    def build_lang_host(c):
        """Host-side (seg, table) in compact mode / (feature, mask) else."""
        if compact:
            s, t = (c.get_language_feature_compact(
                        lf_path, cfg.model.feature_level, split,
                        scene.dataset_type)
                    if have_lang else (None, None))
            if s is None:
                warn_missing(c)
                return (np.full((c.height, c.width), -1, np.int16),
                        np.zeros((64, lang_dim), np.float32))
            # granule-round the table per camera so the cache entry's shape
            # is stable and jit sees a small set of [B,S,L] shapes
            s_pad = -(-t.shape[0] // 64) * 64
            return s, np.pad(t, ((0, s_pad - t.shape[0]), (0, 0)))
        f, m = (c.get_language_feature(lf_path, cfg.model.feature_level,
                                       split, scene.dataset_type)
                if have_lang else (None, None))
        if f is None:
            warn_missing(c)
            return (np.zeros((lang_dim, c.height, c.width), np.float32),
                    np.zeros((1, c.height, c.width), bool))
        return f, m

    # lf_path scopes entries to THIS scene's feature dir: the cache is
    # process-global, and a second scene trained in the same process (test
    # suites, notebooks) must not hit the first scene's stale shapes
    lang_key = ("lang", lf_path, split, cfg.model.feature_level, compact)
    dev_list: List = [None] * len(cams)
    miss = []
    for i, c in enumerate(cams):
        if cache is not None:
            hit = cache.peek(lang_key + (c.image_name,))
            if hit is not None:
                dev_list[i] = hit
                continue
        miss.append(i)
    if len(miss) > 1:
        # per-camera GT-feature loads are independent np IO — overlap them
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(4, len(miss))) as ex:
            built = list(ex.map(lambda i: build_lang_host(cams[i]), miss))
    else:
        built = [build_lang_host(cams[i]) for i in miss]
    for i, arrs in zip(miss, built):
        if cache is not None:
            dev_list[i] = cache.put(lang_key + (cams[i].image_name,), arrs)
        else:
            dev_list[i] = tuple(jnp.asarray(a) for a in arrs)

    if compact:
        tables = [d[1] for d in dev_list]
        segs = [d[0] for d in dev_list]
        if any(s.dtype != jnp.int16 for s in segs):
            segs = [s.astype(jnp.int32) for s in segs]  # >32k-segment frames
        if packed_mode:
            # table padding to the batch max happens inside the step's jit
            return PackedPayload(packed_rows, tuple(imgs_dev), tuple(segs),
                                 tuple(tables))
        s_max = max(t.shape[0] for t in tables)
        tables = [t if t.shape[0] == s_max
                  else jnp.pad(t, ((0, s_max - t.shape[0]), (0, 0)))
                  for t in tables]
        return Batch(
            cams=stacked, times=times, gt_images=gt_images,
            gt_lang=None, lang_mask=None,
            gt_seg=jnp.stack(segs),
            gt_tables=jnp.stack(tables))

    return Batch(
        cams=stacked, times=times, gt_images=gt_images,
        gt_lang=jnp.stack([d[0] for d in dev_list]),
        lang_mask=jnp.stack([d[1].astype(jnp.float32) for d in dev_list]))


def init_state_from_scene(cfg: Config, scene: Scene, seed: int = 0,
                          ) -> tuple:
    """GaussianModel(…) + Scene(...) + create_from_pcd equivalent."""
    dcfg = DeformConfig.from_config(cfg.hidden, cfg.runtime,
                                    max_sh_degree=cfg.model.sh_degree)
    dparams = init_deform_params(jax.random.PRNGKey(seed), dcfg)
    pcd = scene.point_cloud
    capacity = statelib.round_capacity(
        max(int(cfg.optim.max_points * 1.2), len(pcd.points)),
        cfg.runtime.capacity_granule)
    gs = statelib.create_from_pcd(
        pcd.points, pcd.colors, max_sh_degree=cfg.model.sh_degree,
        lang_dim=cfg.runtime.language_feature_hiddendim, capacity=capacity)
    logger.info(f"Number of points at initialisation: {len(pcd.points)} "
                f"(capacity {capacity})")
    state = make_train_state(gs, dparams, scene.aabb)
    return state, dcfg


def save_scene(cfg: Config, state: TrainState, iteration: int, stage: str,
               model_path: str) -> None:
    """Scene.save parity (scene/__init__.py:98-101): PLY + deformation state
    per `{stage}_iteration_{iter}` directory."""
    out_dir = os.path.join(model_path, "point_cloud",
                           f"{stage}_iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    n = int(state.num_active)
    p = jax.device_get(state.params)
    plyio.write_ply(
        os.path.join(out_dir, "point_cloud.ply"),
        plyio.gaussians_to_ply_arrays(
            xyz=p["xyz"][:n], features_dc=p["f_dc"][:n],
            features_rest=p["f_rest"][:n],
            language_feature=p["language_feature"][:n],
            opacity=p["opacity"][:n], scaling=p["scaling"][:n],
            rotation=p["rotation"][:n]))
    from langsplat4d.interop import save_deformation
    save_deformation(out_dir, p["deform"], state)


def save_checkpoint(state: TrainState, iteration: int, stage: str,
                    model_path: str) -> None:
    """Full-state checkpoint (capture(), gaussian_model.py:71-109)."""
    import pickle
    path = os.path.join(model_path, f"chkpnt_{stage}_{iteration}.pth")
    payload = dict(
        iteration=iteration, stage=stage,
        params=jax.device_get(state.params),
        opt_m=jax.device_get(state.opt.m),
        opt_v=jax.device_get(state.opt.v),
        opt_step=int(state.opt.step),
        num_active=int(state.num_active),
        max_radii2d=np.asarray(state.max_radii2d),
        xyz_gradient_accum=np.asarray(state.xyz_gradient_accum),
        denom=np.asarray(state.denom),
        deformation_table=np.asarray(state.deformation_table),
        deformation_accum=np.asarray(state.deformation_accum),
        aabb=np.asarray(state.aabb),
        active_sh_degree=state.active_sh_degree,
    )
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    logger.info(f"[ITER {iteration}] Saved checkpoint {path}")


def load_checkpoint(path: str) -> TrainState:
    import pickle
    from langsplat4d.train.optim import AdamState
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(jnp.asarray, payload["params"])
    return TrainState(
        params=params,
        opt=AdamState(m=jax.tree.map(jnp.asarray, payload["opt_m"]),
                      v=jax.tree.map(jnp.asarray, payload["opt_v"]),
                      step=jnp.asarray(payload["opt_step"], jnp.int32)),
        num_active=jnp.asarray(payload["num_active"], jnp.int32),
        max_radii2d=jnp.asarray(payload["max_radii2d"]),
        xyz_gradient_accum=jnp.asarray(payload["xyz_gradient_accum"]),
        denom=jnp.asarray(payload["denom"]),
        deformation_table=jnp.asarray(payload["deformation_table"]),
        deformation_accum=jnp.asarray(payload["deformation_accum"]),
        aabb=jnp.asarray(payload["aabb"]),
        active_sh_degree=payload["active_sh_degree"],
    ), payload


def _image2save(arr: np.ndarray, mode: str):
    """[C,H,W] float array -> PIL image; lang maps are rescaled (x+1)/2 and
    PCA-compressed to 3 channels when wider (reference image2save,
    train.py:74-96)."""
    from PIL import Image
    if mode == "lang":
        arr = (arr + 1.0) / 2.0
        if arr.shape[0] > 3:
            from sklearn.decomposition import PCA
            fmap = arr.transpose(1, 2, 0)
            h, w, c = fmap.shape
            flat = PCA(n_components=3).fit_transform(fmap.reshape(-1, c))
            fmap = flat.reshape(h, w, 3)
            fmap = (fmap - fmap.min()) / (fmap.max() - fmap.min() + 1e-12)
            return Image.fromarray((fmap * 255).astype(np.uint8))
    img = np.clip(arr[:3].transpose(1, 2, 0), 0, 1)
    return Image.fromarray((img * 255).astype(np.uint8))


def _debug_image_dump(model_path: str, stage: str, iteration: int,
                      render_img, gt_img, lang_img, gt_lang_img) -> None:
    """rgb|gt|lang|gt_lang horizontal grid every log interval
    (reference train.py:314-327, saved under training_output_img/)."""
    from PIL import Image
    images = [_image2save(np.asarray(render_img), "rgb"),
              _image2save(np.asarray(gt_img), "rgb"),
              _image2save(np.asarray(lang_img), "lang"),
              _image2save(np.asarray(gt_lang_img), "lang")]
    total_w = sum(im.size[0] for im in images)
    total_h = max(im.size[1] for im in images)
    grid = Image.new("RGB", (total_w, total_h))
    x = 0
    for im in images:
        grid.paste(im, (x, 0))
        x += im.size[0]
    save_dir = os.path.join(model_path, "training_output_img")
    os.makedirs(save_dir, exist_ok=True)
    grid.save(os.path.join(save_dir, f"output_{stage}_{iteration}.png"))


def _gui_poll(cfg: Config, scene: Scene, state: TrainState,
              step_cfg: StepConfig, stage: str, iteration: int,
              final_iter: int, bg, gui_ctx: dict) -> None:
    """Viewer-bridge polling, one drain per training iteration (reference
    train.py:166-191): accept a pending connection, render the requested
    custom camera at the cycled video-camera time, stream raw RGB bytes back.
    No-op (one failed non-blocking accept) when no viewer is attached."""
    from langsplat4d.utils import network_gui
    if network_gui.listener is None:
        return
    if network_gui.conn is None:
        network_gui.try_connect()
    import dataclasses as _dc
    from langsplat4d.render.pipeline import render
    from langsplat4d.render.raster import CameraParams
    while network_gui.conn is not None:
        try:
            net_image_bytes = None
            (custom_cam, do_training, _shs_py, _cov_py, keep_alive,
             scaling_mod) = network_gui.receive()
            if custom_cam is not None:
                if "video_cams" not in gui_ctx:
                    gui_ctx["video_cams"] = list(scene.getVideoCameras())
                video_cams = gui_ctx["video_cams"]
                gui_ctx["count"] = count = gui_ctx.get("count", 0) + 1
                t = 0.0
                if video_cams:
                    vi = count % len(video_cams)
                    if (count // len(video_cams)) % 2 != 0:
                        vi = len(video_cams) - vi - 1
                    t = float(video_cams[vi].time)
                camp = CameraParams(
                    viewmatrix=jnp.asarray(custom_cam.world_view_transform,
                                           jnp.float32),
                    projmatrix=jnp.asarray(custom_cam.full_proj_transform,
                                           jnp.float32),
                    campos=jnp.asarray(
                        custom_cam.camera_center.astype(np.float32)),
                    tanfovx=jnp.asarray(np.tan(custom_cam.fovx * 0.5),
                                        jnp.float32),
                    tanfovy=jnp.asarray(np.tan(custom_cam.fovy * 0.5),
                                        jnp.float32))
                settings = _dc.replace(
                    step_cfg.settings, image_height=custom_cam.height,
                    image_width=custom_cam.width,
                    sh_degree=int(state.active_sh_degree))
                out = render(settings, step_cfg.dcfg, stage, camp,
                             jnp.asarray(t, jnp.float32), state.gaussians(),
                             state.params["deform"], state.aabb, bg,
                             scaling_modifier=float(scaling_mod or 1.0),
                             nonormalized=step_cfg.nonormalized)
                img = np.asarray(jnp.clip(out["render"], 0.0, 1.0))
                net_image_bytes = memoryview(
                    (img * 255).astype(np.uint8).transpose(1, 2, 0).copy())
            network_gui.send(net_image_bytes, cfg.model.source_path or "")
            if do_training and (iteration < final_iter or not keep_alive):
                break
        except Exception:
            network_gui.conn = None


def _tune_stream_train(cfg: Config, settings: RasterSettings,
                       train_cams, state: TrainState):
    """Size the stream-binned TRAINING composite (render/stream_vjp.py).

    Autotunes the span tiers and the chunk-aligned slot budget from the
    initial Gaussians over a few sample views, and returns an `audit`
    closure the densify block calls every densification interval: the CUDA
    reference reallocates its duplicate+sort buffers dynamically per frame
    (4d-langsplat-rasterization submodule); the XLA analogue is a measured
    budget + periodic re-audit that re-specializes the jitted step when
    densification grows the emission count past the margin — recompiles
    land at densify cadence, never in the hot loop.

    Returns (settings, audit) where audit(settings, state, cam) -> replaced
    settings (budget bumped) or None. Sizing uses CANONICAL (undeformed)
    attributes like the render driver's autotune (render/driver.py); the
    1.3 margin absorbs deformation-induced drift.
    """
    import dataclasses as _dc

    from langsplat4d.core.transforms import safe_normalize
    from langsplat4d.render.raster import preprocess
    from langsplat4d.render.stream import autotune_tiers, narrow_valid_count

    chunk = settings.stream_train_chunk
    gran = max(8192, chunk)

    def _prep(gs, camp):
        return preprocess(
            settings, camp, gs.xyz, jnp.zeros((gs.capacity, 2)),
            jax.nn.sigmoid(gs.opacity), jnp.exp(gs.scaling),
            safe_normalize(gs.rotation), None,
            colors_precomp=jnp.zeros((gs.capacity, 3)),
            active=gs.active_mask())

    prep_fn = jax.jit(_prep)
    p0 = prep_fn(state.gaussians(), train_cams[0].camera_params())
    rmin = np.asarray(p0["rect_min"])
    rmax = np.asarray(p0["rect_max"])
    vism = np.asarray(p0["visible"])
    spans = np.maximum((rmax[:, 0] - rmin[:, 0])[vism],
                       (rmax[:, 1] - rmin[:, 1])[vism])
    tiers = autotune_tiers(spans)

    count_fn = jax.jit(lambda gs, camp: narrow_valid_count(
        settings, _prep(gs, camp), tiers=tiers,
        ellipse_cull=settings.stream_ellipse_cull))
    idxs = sorted({0, len(train_cams) // 2, len(train_cams) - 1})
    n_est = max(int(count_fn(state.gaussians(),
                             train_cams[i].camera_params()))
                for i in idxs)
    budget = max(gran, -(-int(n_est * 1.3) // gran) * gran)
    settings = _dc.replace(settings, stream_train=True, stream_tiers=tiers,
                           stream_budget=budget)
    logger.info(f"stream-train composite: tiers={tiers} budget={budget} "
                f"(demand {n_est} over {len(idxs)} views, chunk {chunk})")

    def audit(cur: RasterSettings, st: TrainState, cam) -> RasterSettings:
        n = int(count_fn(st.gaussians(), cam.camera_params()))
        if n <= int(cur.stream_budget * 0.85):
            return None
        new_budget = -(-int(n * 1.3) // gran) * gran
        logger.info(
            f"stream-train budget {cur.stream_budget} -> {new_budget} "
            f"(demand {n} after densification); re-specializing the step")
        return _dc.replace(cur, stream_budget=new_budget)

    return settings, audit


def maybe_stream_switch(cfg: Config, settings: RasterSettings,
                        state: TrainState, train_cams, iteration: int = 0):
    """Tile-list truncation probe -> stream-train switch decision.

    Returns (new_settings, audit) when the padded tile lists are saturated
    on the probe view (full-list fraction > 5% or peak band occupancy at
    capacity — the only regimes where the capacity-bounded binning may have
    DROPPED entries, render/raster.py binning_saturation), else None. The
    caller re-specializes the jitted step with the returned settings; the
    switch trades the ~1.5x step-speed cost of the stream composite for
    truncation-free gradients (the CUDA reference's dynamically-sized
    duplicate+sort buffers never truncate, so neither may training here)."""
    from langsplat4d.render.pipeline import binning_report
    stats = binning_report(settings, train_cams[0].camera_params(),
                           state.gaussians())
    if (stats["tile_full_frac"] <= 0.05
            and stats["band_max_count"] < settings.band_capacity):
        return None
    logger.warning(
        f"[ITER {iteration}] tile lists saturated (full frac "
        f"{stats['tile_full_frac']:.1%}, band max "
        f"{int(stats['band_max_count'])}/{settings.band_capacity}): "
        "switching to the stream-binned training composite "
        "(truncation-free; LS4D_STREAM_TRAIN_AUTO=0 opts out)")
    return _tune_stream_train(cfg, settings, train_cams, state)


def scene_reconstruction(cfg: Config, scene: Scene, state: TrainState,
                         dcfg: DeformConfig, stage: str, joint_train: bool,
                         train_iter: int, timer: Timer,
                         rng_seed: int = 0) -> TrainState:
    """One curriculum stage (reference scene_reconstruction,
    train.py:98-427)."""
    opt = cfg.optim
    ex = cfg.extras
    rng = random.Random(rng_seed)
    split_key = jax.random.PRNGKey(rng_seed + 7)
    logger.info(f"stage:{stage} begin... train_iter:{train_iter}, "
                f"joint_train:{joint_train}")
    from langsplat4d.utils.telemetry import Telemetry
    telemetry = Telemetry(cfg.model.model_path or None,
                          wandb_name=cfg.extras.expname)

    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    train_cams = scene.getTrainCameras()
    batch_size = opt.batch_size if "base" in stage else 1

    first = train_cams[0]
    settings = RasterSettings(
        image_height=first.height, image_width=first.width,
        sh_degree=0, lang_dim=cfg.runtime.language_feature_hiddendim,
        include_feature="base" not in stage,
        tile_size=cfg.runtime.tile_size,
        tile_capacity=cfg.runtime.tile_capacity,
        # fused Pallas primal + backward inside the analytic VJP (TPU only)
        vjp_pallas_forward=jax.default_backend() == "tpu",
        vjp_pallas_backward=jax.default_backend() == "tpu")
    stream_audit = None
    if cfg.runtime.stream_train:
        settings, stream_audit = _tune_stream_train(cfg, settings,
                                                    train_cams, state)

    # ---- multi-chip mesh (runtime.data_parallel x runtime.gaussian_shards,
    # a NEW capability vs the strictly single-GPU reference) ----
    # Gaussian-axis sharding always applies (per-Gaussian params + Adam
    # moments + N-axis compute shard; XLA all-gathers the small render
    # attributes over ICI). The data axis additionally shards the camera
    # batch — only usable when the stage's batch size divides over it
    # (lang stages run batch 1, reference train.py:207).
    mesh = None
    shard_batch_fn = None
    n_mesh = cfg.runtime.data_parallel * cfg.runtime.gaussian_shards
    if n_mesh > 1:
        from langsplat4d.parallel.mesh import (make_mesh, shard_batch,
                                               shard_state)
        mesh = make_mesh(n_mesh, data=cfg.runtime.data_parallel,
                         gauss=cfg.runtime.gaussian_shards)
        state = shard_state(state, mesh)
        data_shardable = (batch_size % cfg.runtime.data_parallel == 0
                          and cfg.runtime.data_parallel > 1)
        if data_shardable:
            shard_batch_fn = lambda b: shard_batch(b, mesh)  # noqa: E731
        logger.info(
            f"mesh: data{cfg.runtime.data_parallel} x "
            f"gauss{cfg.runtime.gaussian_shards} "
            f"(batch {'sharded' if data_shardable else 'replicated'} "
            f"at batch_size={batch_size})")

    lr_cfg = LRConfig.from_optim(opt, scene.cameras_extent)
    step_cfg = StepConfig(
        settings=settings, dcfg=dcfg, lr_cfg=lr_cfg, stage=stage,
        joint_train=joint_train, no_dlang=bool(cfg.hidden.no_dlang),
        lam=ex.lam, beta=ex.beta, addcosloss=cfg.runtime.addcosloss,
        lambda_dssim=opt.lambda_dssim, nonormalized=cfg.runtime.nonormalized,
        # the reference's plane-reg guard (`stage == "fine"`) never matches its
        # stage names (train.py:331) — preserved: regularizer off by default.
        # runtime.plane_reg opts into the reference presets' configured
        # INTENT (hidden.* weights, applied in fine stages like the guard
        # meant to): smooths the time axis so a sparsely-supervised time
        # cell cannot collapse the moving object (QUALITY.md round 5).
        time_smoothness_weight=(cfg.hidden.time_smoothness_weight
                                if (cfg.runtime.plane_reg
                                    and stage.startswith("fine")) else 0.0),
        l1_time_planes=cfg.hidden.l1_time_planes,
        plane_tv_weight=cfg.hidden.plane_tv_weight,
        batch_size=batch_size,
        # data-sharded batches need the vmapped camera loop (lax.map is
        # sequential and cannot shard the batch axis)
        vmap_batch=shard_batch_fn is not None)

    # single-dispatch step path (train_step_packed): camera rows packed into
    # one host upload, GT arrays passed as cached device refs, batch
    # assembly inside the jit. Data-parallel batch sharding keeps the
    # legacy Batch path (shard_batch needs the stacked arrays).
    use_packed = (shard_batch_fn is None
                  and getattr(cfg.runtime, "packed_step", True)
                  and ("base" in stage
                       or getattr(cfg.runtime, "compact_batch", True)))

    def batch_source():
        """Camera sampling + batch building, run `prefetch_depth` iterations
        ahead on a producer thread (data/prefetch.py): PIL decode, GT-feature
        gather and H2D transfer of batch i+1 overlap step i's device time."""
        if opt.dataloader:
            sampler = (FineSampler(train_cams)
                       if opt.custom_sampler is not None else None)
            loader = iter(BatchLoader(train_cams, batch_size, sampler=sampler,
                                      seed=rng_seed))
        else:
            loader = None
            viewpoint_stack = list(range(len(train_cams)))
            temp_list = list(viewpoint_stack)
        for it in range(1, train_iter + 1):
            if loader is not None:
                try:
                    cams = next(loader)
                except StopIteration:
                    loader = iter(BatchLoader(train_cams, batch_size,
                                              seed=rng_seed + it))
                    cams = next(loader)
            else:
                cams = []
                for _ in range(batch_size):
                    idx = viewpoint_stack.pop(
                        rng.randrange(len(viewpoint_stack)))
                    if not viewpoint_stack:
                        viewpoint_stack.extend(temp_list)
                    cams.append(train_cams[idx])
            yield cams, build_batch(cams, cfg, scene, split,
                                    need_lang="base" not in stage,
                                    packed_iter=(it if use_packed else None))

    import contextlib

    def mctx():
        # Mesh is a reusable context manager; densify's sharding constraints
        # read the thread-local mesh at trace time (densify.py:52-72)
        return mesh if mesh is not None else contextlib.nullcontext()

    from langsplat4d.data.prefetch import prefetch
    ema_loss = 0.0
    split = "train"
    gui_ctx: dict = {}
    batch_iter = prefetch(batch_source(), depth=cfg.runtime.prefetch_depth)

    # Host round-trips are the enemy of full-loop throughput (one value
    # fetch costs ~35 ms over the device tunnel, PERF.md): keep per-step
    # losses on device and drain them in ONE stacked fetch every 10
    # iterations. The NaN/explosion watchdog (train.py:341-351) then fires
    # with <=9 iterations of lag — it re-execs the whole process anyway.
    host_n_active = int(state.num_active)
    pending_losses: List[tuple] = []   # (iteration, device scalar)
    grow_ctx = {"density_threshold": 5.0, "displacement_scale": 5.0}

    def drain_losses() -> float:
        nonlocal ema_loss
        if not pending_losses:
            return ema_loss
        vals = np.asarray(jnp.stack([d for _, d in pending_losses]))
        for (it, _), v in zip(pending_losses, vals):
            v = float(v)
            if not np.isfinite(v):
                logger.info("loss is nan, end training, reexecv program now.")
                _watchdog_restart(cfg, f"loss is nan at iteration {it}")
            if v > 0.5 and it > 100 and "coarse-lang" not in stage:
                logger.info("loss bigger than 0.5, end training, "
                            "reexecv program now.")
                _watchdog_restart(cfg, f"loss {v} > 0.5 at iteration {it}")
            ema_loss = 0.4 * v + 0.6 * ema_loss
        last = float(vals[-1])
        pending_losses.clear()
        return last

    for iteration in range(1, train_iter + 1):
        _gui_poll(cfg, scene, state, step_cfg, stage, iteration, train_iter,
                  bg, gui_ctx)
        if iteration % 1000 == 0:
            from langsplat4d.train.trainstate import one_up_sh_degree
            state = one_up_sh_degree(state, cfg.model.sh_degree)

        cams, batch = next(batch_iter)
        if shard_batch_fn is not None:
            batch = shard_batch_fn(batch)

        state_before = state   # train_step does not donate; kept for the
        #                        forensics dump below (no cost otherwise)
        with mctx():
            if isinstance(batch, PackedPayload):
                state, metrics, vs_grad, visibility, radii_max = \
                    train_step_packed(
                        step_cfg, state, jnp.asarray(batch.packed),
                        batch.imgs, batch.segs, batch.tables, bg,
                        state.active_sh_degree)
            else:
                state, metrics, vs_grad, visibility, radii_max = train_step(
                    step_cfg, state, batch, bg,
                    jnp.asarray(iteration, jnp.int32),
                    state.active_sh_degree)
        pending_losses.append((iteration, metrics["loss"]))

        if os.getenv("LS4D_NAN_FORENSICS"):
            # Debug mode (jax_debug_nans is ineffective on runtimes that
            # defer execution until a value is pulled, and per-iteration
            # syncs cost seconds over the device tunnel): keep the last 12
            # (pre-step state, batch) transitions alive on device (no
            # donation, so this is just references) and probe a params-
            # finite canary at the existing every-10 loss-drain cadence. On
            # a trip, dump the whole window — offline bisection finds the
            # exact poisoning transition.
            if "_nan_canary" not in gui_ctx:
                from collections import deque
                gui_ctx["_nan_window"] = deque(maxlen=12)
                gui_ctx["_nan_canary"] = jax.jit(lambda tree: jnp.all(
                    jnp.stack([jnp.isfinite(x).all()
                               for x in jax.tree.leaves(tree)
                               if jnp.issubdtype(x.dtype, jnp.floating)])))
            gui_ctx["_nan_window"].append((
                iteration, state_before,
                # PackedPayload is a pytree LEAF (device_get would skip its
                # arrays); forensics runs eagerly anyway, so expand it
                payload_to_batch(batch) if isinstance(batch, PackedPayload)
                else batch))
            if iteration % 10 == 0 and not bool(
                    gui_ctx["_nan_canary"](state.params)):
                import pickle
                dump = os.path.join(cfg.model.model_path or "/tmp",
                                    f"nan_forensics_{stage}_{iteration}.pkl")
                with open(dump, "wb") as fh:
                    pickle.dump(dict(
                        stage=stage,
                        window=[(it_, jax.device_get(s_),
                                 jax.device_get(b_))
                                for it_, s_, b_ in gui_ctx["_nan_window"]],
                        bg=np.asarray(bg),
                        active_sh_degree=int(state.active_sh_degree),
                        step_cfg=step_cfg), fh)
                logger.error(f"NaN window dumped to {dump}")
                _watchdog_restart(cfg, f"params non-finite at iteration "
                                       f"{iteration} (forensics dumped)")

        if iteration % 10 == 0 or iteration == train_iter:
            loss = drain_losses()
            telemetry.scalars(
                {f"{stage}/train_loss_patches/l1_loss": loss,
                 f"{stage}/train_loss_patchestotal_loss": loss,
                 f"{stage}/total_points": host_n_active}, iteration)

        if iteration % 100 == 0:
            logger.info(
                f"[{stage}] iter {iteration}/{train_iter} "
                f"loss {ema_loss:.6f} points {host_n_active}")
            # rgb|gt|lang|gt_lang debug grid (train.py:314-327); one extra
            # eval forward at log cadence — the jitted train step does not
            # materialize images to host.
            if cfg.model.model_path:
                from langsplat4d.train.step import (eval_step,
                                                    materialize_batch)
                out = eval_step(step_cfg, state, cams[0].camera_params(),
                                jnp.asarray(cams[0].time), bg,
                                state.active_sh_degree)
                full = materialize_batch(
                    payload_to_batch(batch) if isinstance(batch,
                                                          PackedPayload)
                    else batch)  # eager; debug cadence only
                gt_lang0 = (full.gt_lang[0] if full.gt_lang is not None
                            else jnp.zeros(
                                (cfg.runtime.language_feature_hiddendim,)
                                + full.gt_images.shape[2:]))
                lang = out.get("language_feature_image")
                if lang is None or lang.shape[0] == 0:
                    lang = jnp.zeros_like(gt_lang0)
                _debug_image_dump(cfg.model.model_path, stage, iteration,
                                  out["render"], full.gt_images[0],
                                  lang, gt_lang0)

        timer.pause()
        if iteration in ex.test_iterations:
            training_report(cfg, scene, state, dcfg, step_cfg, stage,
                            iteration, bg, telemetry=telemetry)
        if (iteration in ex.save_iterations) and "coarse-base" not in stage:
            logger.info(f"\n[ITER {iteration}] Saving Gaussians")
            save_scene(cfg, state, iteration, stage, cfg.model.model_path)
        if cfg.model.render_process and (
                (iteration < 1000 and iteration % 10 == 9)
                or (iteration < 3000 and iteration % 50 == 49)
                or (iteration < 60000 and iteration % 100 == 99)):
            render_process_snapshot(cfg, scene, state, dcfg, step_cfg, stage,
                                    iteration, bg, timer.get_elapsed_time())
        timer.start()

        # ---- densification (base stages only, train.py:388-414) ----
        if iteration < opt.densify_until_iter and "base" in stage:
            with mctx():
                state = D.update_max_radii(state, radii_max, visibility)
                state = D.add_densification_stats(state, vs_grad, visibility)

            if "coarse" in stage:
                opacity_threshold = opt.opacity_threshold_coarse
                densify_threshold = opt.densify_grad_threshold_coarse
            else:
                opacity_threshold = opt.opacity_threshold_fine_init \
                    - iteration * (opt.opacity_threshold_fine_init
                                   - opt.opacity_threshold_fine_after) \
                    / opt.densify_until_iter
                densify_threshold = opt.densify_grad_threshold_fine_init \
                    - iteration * (opt.densify_grad_threshold_fine_init
                                   - opt.densify_grad_threshold_after) \
                    / opt.densify_until_iter

            # host_n_active mirrors state.num_active, refreshed only after
            # ops that change it — a per-iteration int(state.num_active)
            # would force a device round-trip in the hot loop.
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0
                    and host_n_active < opt.max_points):
                split_key, sub = jax.random.split(split_key)
                with mctx():
                    state = D.densify(state, densify_threshold,
                                      scene.cameras_extent,
                                      opt.percent_dense, sub)
                host_n_active = int(state.num_active)
                if host_n_active >= state.capacity:
                    logger.warning(
                        f"Gaussian capacity {state.capacity} saturated; "
                        "further densification drops new points. Raise "
                        "runtime.capacity_granule / optim.max_points.")
            if (iteration > opt.pruning_from_iter
                    and iteration % opt.pruning_interval == 0
                    and host_n_active > opt.min_points_for_prune):
                size_threshold = (20.0 if iteration > opt.opacity_reset_interval
                                  else 0.0)
                with mctx():
                    state = D.prune(state, opacity_threshold,
                                    scene.cameras_extent, size_threshold)
                host_n_active = int(state.num_active)
            if (opt.add_point and iteration % opt.densification_interval == 0
                    and host_n_active < opt.max_points):
                # point growing (train.py:409-410, grow(5,5,...)); thresholds
                # halve when a round adds <100 points, mirroring the
                # reference's self-mutating state (gaussian_model.py:694-697)
                with mctx():
                    state, added = D.grow(
                        state, grow_ctx["density_threshold"],
                        grow_ctx["displacement_scale"], seed=iteration)
                if added < 100:
                    grow_ctx["density_threshold"] /= 2
                    grow_ctx["displacement_scale"] /= 2
                    logger.info("reduce diplacement_scale to: "
                                f"{grow_ctx['displacement_scale']}")
                logger.info(f"point growing,add point num:{added}")
                host_n_active = int(state.num_active)
            if iteration % opt.opacity_reset_interval == 0:
                logger.info("reset opacity")
                with mctx():
                    state = D.reset_opacity(state)

            # stream-train budget audit: densification grows the emission
            # count; bump the slot budget (one re-jit, off the hot path)
            # before truncation could silently clip training gradients.
            if (stream_audit is not None
                    and iteration % opt.densification_interval == 0):
                new_settings = stream_audit(step_cfg.settings, state, cams[0])
                if new_settings is not None:
                    step_cfg = step_cfg._replace(settings=new_settings)

            # tile-list truncation auto-switch: when densify pressure
            # saturates the padded tile lists (saturated lists silently
            # clip the farthest Gaussians' contributions AND gradients —
            # the CUDA reference's dynamic buffers never truncate), flip
            # to the exact stream-binned training composite. One re-jit at
            # densify cadence; exactness over the ~1.5x step-speed cost.
            # TPU-gated: the stream composite is a pallas kernel (CPU runs
            # keep the golden-tested list path, which tests bound).
            if (stream_audit is None and cfg.runtime.stream_train_auto
                    and not step_cfg.settings.stream_train
                    and jax.default_backend() == "tpu"
                    and iteration % opt.densification_interval == 0):
                switched = maybe_stream_switch(cfg, step_cfg.settings, state,
                                               train_cams, iteration)
                if switched is not None:
                    new_settings, stream_audit = switched
                    step_cfg = step_cfg._replace(settings=new_settings)

        if (iteration in ex.checkpoint_iterations) and "fine" in stage:
            if cfg.runtime.orbax_ckpt:
                from langsplat4d.train import ckpt_orbax
                path = os.path.join(cfg.model.model_path,
                                    f"orbax_{stage}_{iteration}")
                ckpt_orbax.save_async(path, state)
                logger.info(f"[ITER {iteration}] async orbax checkpoint "
                            f"started -> {path}")
            else:
                save_checkpoint(state, iteration, stage,
                                cfg.model.model_path)

    telemetry.close()
    return state


def training_report(cfg: Config, scene: Scene, state: TrainState,
                    dcfg: DeformConfig, step_cfg: StepConfig, stage: str,
                    iteration: int, bg, telemetry=None) -> None:
    """Held-out L1/PSNR at test_iterations (reference training_report,
    train.py:487-539): sparse camera sweep over test + train splits, with
    the reference's TensorBoard artifacts — per-view render images (first 5,
    GT once at the first test iteration), opacity/motion histograms,
    total_points and deformation_rate."""
    from langsplat4d.train.losses import l1_loss, psnr
    from langsplat4d.train.step import eval_step

    first_test_iter = (min(cfg.extras.test_iterations)
                       if cfg.extras.test_iterations else iteration)
    configs = [("test", scene.getTestCameras()),
               ("train", scene.getTrainCameras())]
    for name, cams in configs:
        if len(cams) == 0:
            continue
        idxs = [i % len(cams) for i in range(10, 5000, 299)]
        l1_total = psnr_total = 0.0
        for k, i in enumerate(idxs):
            cam = cams[i]
            out = eval_step(step_cfg, state, cam.camera_params(),
                            jnp.asarray(cam.time), bg,
                            state.active_sh_degree)
            img = jnp.clip(out["render"], 0.0, 1.0)
            gt = jnp.clip(jnp.asarray(cam.image[:3]), 0.0, 1.0)
            if telemetry is not None and k < 5:
                telemetry.image(
                    f"{stage}/{name}_view_{cam.image_name}/render",
                    np.asarray(img), iteration)
                if iteration == first_test_iter:
                    telemetry.image(
                        f"{stage}/{name}_view_{cam.image_name}/ground_truth",
                        np.asarray(gt), iteration)
            l1_total += float(l1_loss(img, gt))
            psnr_total += float(psnr(img, gt))
        n = len(idxs)
        logger.info(f"\n[ITER {iteration}] Evaluating {name}: "
                    f"L1 {l1_total / n} PSNR {psnr_total / n}")
        if telemetry is not None:
            telemetry.scalars(
                {f"{stage}/{name}/loss_viewpoint - l1_loss": l1_total / n,
                 f"{stage}/{name}/loss_viewpoint - psnr": psnr_total / n},
                iteration)

    if telemetry is not None:
        n_act = int(state.num_active)
        logit_op = np.asarray(state.params["opacity"][:n_act])
        telemetry.histogram(f"{stage}/scene/opacity_histogram",
                            1.0 / (1.0 + np.exp(-logit_op)), iteration)
        telemetry.scalars(
            {f"{stage}/total_points": n_act,
             f"{stage}/deformation_rate":
                 float(np.asarray(state.deformation_table[:n_act]).sum())
                 / max(n_act, 1)}, iteration)
        telemetry.histogram(
            f"{stage}/scene/motion_histogram",
            np.asarray(state.deformation_accum[:n_act]).mean(-1) / 100.0,
            iteration)

    # Binning truncation probe (band/cell/tile capacities silently drop the
    # farthest Gaussians when saturated — surface it at report iterations).
    test_cams = scene.getTestCameras() or scene.getTrainCameras()
    if len(test_cams) > 0:
        from langsplat4d.render.pipeline import binning_report
        stats = binning_report(step_cfg.settings,
                               test_cams[0].camera_params(),
                               state.gaussians())
        msg = (f"[ITER {iteration}] binning: band max "
               f"{int(stats['band_max_count'])}/"
               f"{step_cfg.settings.band_capacity}, full lists "
               f"cell {stats['cell_full_frac']:.1%} "
               f"tile {stats['tile_full_frac']:.1%}")
        if (stats["band_max_count"] >= step_cfg.settings.band_capacity
                or stats["cell_full_frac"] > 0.05
                or stats["tile_full_frac"] > 0.05):
            logger.warning(msg + " — capacities saturated; raise "
                           "band_capacity/cell_capacity/tile_capacity.")
        else:
            logger.info(msg)


def render_process_snapshot(cfg: Config, scene: Scene, state: TrainState,
                            dcfg: DeformConfig, step_cfg: StepConfig,
                            stage: str, iteration: int, bg,
                            elapsed: float) -> None:
    """Periodic GT|render|depth triptych (train.py:376-382 render_process)."""
    import numpy as np
    from langsplat4d.train.step import eval_step
    from langsplat4d.utils.scene_vis import render_training_image

    for split_name, cams in (("test", scene.getTestCameras()),
                             ("train", scene.getTrainCameras())):
        if len(cams) == 0:
            continue
        cam = cams[iteration % len(cams)]
        out = eval_step(step_cfg, state, cam.camera_params(),
                        jnp.asarray(cam.time), bg, state.active_sh_degree)
        render_training_image(
            os.path.join(cfg.model.model_path, "render_process"),
            stage + split_name, iteration, elapsed,
            np.asarray(cam.image[:3]), np.asarray(out["render"]),
            np.asarray(out["depth"]), int(state.num_active))


def training(cfg: Config) -> TrainState:
    """Full curriculum (reference training(), train.py:428-466)."""
    model_path = cfg.model.model_path
    if not model_path:
        model_path = os.path.join(cfg.runtime.exps_dir, cfg.extras.expname)
        cfg.model.model_path = model_path
    os.makedirs(model_path, exist_ok=True)
    from langsplat4d.config import save_cfg_args
    save_cfg_args(cfg, model_path)

    scene = Scene(cfg.model.source_path,
                  images=cfg.model.images, eval_split=cfg.model.eval,
                  llffhold=cfg.model.llffhold,
                  white_background=cfg.model.white_background,
                  extension=cfg.model.extension,
                  add_random_points=cfg.model.add_points,
                  model_path=model_path)
    timer = Timer()
    timer.start()

    opt = cfg.optim
    ex = cfg.extras

    if ex.resume_from_final_stage == 1:
        # fine-lang-discrete resume path (train.py:436-441), phase B of the
        # two-phase video-feature schedule (scripts/train_eval.sh:20-33).
        from langsplat4d.train import ckpt_orbax
        if ckpt_orbax.is_orbax_checkpoint(ex.start_checkpoint):
            state = ckpt_orbax.restore_auto(ex.start_checkpoint)
        else:
            state, payload = load_checkpoint(ex.start_checkpoint)
        dcfg = DeformConfig.from_config(cfg.hidden, cfg.runtime,
                                        max_sh_degree=cfg.model.sh_degree)
        state = prepare_discrete_stage(cfg, state, dcfg,
                                       init_from_stage=ex.init_from_stage)
        state = scene_reconstruction(
            cfg, scene, state, dcfg, "fine-lang-discrete", ex.joint_fine,
            opt.fine_lang_iterations + 10000, timer)
        return state

    state, dcfg = init_state_from_scene(cfg, scene, seed=cfg.extras.seed)
    stages = [
        ("coarse-base", False, opt.coarse_base_iterations),
        ("coarse-lang", ex.joint_coarse, opt.coarse_lang_iterations),
        ("fine-base", False, opt.fine_base_iterations),
        ("fine-lang", ex.joint_fine, opt.fine_lang_iterations),
    ]
    for stage, joint, iters in stages:
        if iters > 0:
            state = scene_reconstruction(cfg, scene, state, dcfg, stage,
                                         joint, iters, timer)
    return state


def prepare_discrete_stage(cfg: Config, state: TrainState,
                           dcfg: DeformConfig,
                           init_from_stage: str = "fine-base",
                           sample_num: int = 100) -> TrainState:
    """K-Means/noise init of per-Gaussian discrete feature centers
    (generate_multi_feature_centers, gaussian_model.py:804-845) and expansion
    of the language_feature param to centers_num*lang_dim columns."""
    lang_dim = cfg.runtime.language_feature_hiddendim
    centers_num = cfg.runtime.centers_num
    p = state.params
    lf = np.asarray(p["language_feature"])
    cap = lf.shape[0]
    n = int(state.num_active)

    if lf.shape[1] != lang_dim:
        return state  # already expanded

    if init_from_stage == "fine-base":
        lf_n = lf / (np.linalg.norm(lf, axis=-1, keepdims=True) + 1e-9)
        rng = np.random.default_rng(0)
        multi = np.stack([rng.normal(loc=lf_n, scale=0.05).astype(np.float32)
                          for _ in range(centers_num)], axis=1)
    else:
        # sample deformed language features at random times, then K-Means
        from sklearn.cluster import KMeans
        import dataclasses as _dc
        from langsplat4d.field.deformation import deform_forward
        gs = state.gaussians()
        samples = []
        sample_cfg = _dc.replace(dcfg, no_dlang=False,
                                 use_discrete_lang_f=False)
        rng = np.random.default_rng(0)
        lf_n = lf / (np.linalg.norm(lf, axis=-1, keepdims=True) + 1e-9)
        for s in range(sample_num):
            t = jnp.asarray(rng.random((cap, 1)).astype(np.float32))
            out = deform_forward(
                p["deform"], sample_cfg, state.aabb, gs.xyz, gs.scaling,
                gs.rotation, gs.opacity, gs.get_features(),
                jnp.asarray(lf_n), t, init_centers=True)
            samples.append(np.asarray(out[5]))
        res = np.stack(samples, axis=1)  # [cap, sample_num, L]
        multi = np.zeros((cap, centers_num, lang_dim), np.float32)
        for i in range(n):
            km = KMeans(n_clusters=centers_num, random_state=0,
                        n_init=10).fit(res[i])
            multi[i] = km.cluster_centers_
    # reference reshapes [n, centers, dim] -> permute(0,2,1) -> flatten
    # (gaussian_model.py:230)
    flat = multi.transpose(0, 2, 1).reshape(cap, -1)
    params = dict(p, language_feature=jnp.asarray(flat))
    # fresh Adam moments for the reshaped parameter
    m = dict(state.opt.m, language_feature=jnp.zeros_like(params["language_feature"]))
    v = dict(state.opt.v, language_feature=jnp.zeros_like(params["language_feature"]))
    return state.replace(params=params,
                         opt=state.opt.replace(m=m, v=v))
