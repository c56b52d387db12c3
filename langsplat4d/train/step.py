"""The jitted training step: batched render -> loss -> grads -> Adam.

Maps the body of `scene_reconstruction`'s hot loop (train.py:164-426) into a
single compiled function per (stage, settings): renders a camera batch
sequentially under remat, computes the stage loss (train.py:283-337), takes
grads w.r.t. trainable params AND the NDC viewspace dummies (densify stats,
train.py:352-354), and applies the per-group Adam update.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from langsplat4d.field.deformation import DeformConfig
from langsplat4d.render.pipeline import render
from langsplat4d.render.raster import CameraParams, RasterSettings
from langsplat4d.train import losses
from langsplat4d.train.optim import (
    LRConfig,
    adam_update,
    group_lrs,
    label_tree,
    trainable_tree,
)
from langsplat4d.train.trainstate import TrainState


class StepConfig(NamedTuple):
    """Static per-stage configuration of the train step."""
    settings: RasterSettings
    dcfg: DeformConfig
    lr_cfg: LRConfig
    stage: str
    joint_train: bool = False
    no_dlang: bool = True
    lam: float = 0.2            # lang-L1 weight (train.py:287, args.lam)
    beta: float = 0.01          # cos-loss weight (train.py:291, args.beta)
    addcosloss: bool = False
    lambda_dssim: float = 0.0
    nonormalized: bool = False
    time_smoothness_weight: float = 0.0  # dead in reference (guard train.py:331)
    l1_time_planes: float = 0.0
    plane_tv_weight: float = 0.0
    batch_size: int = 1
    # vmap the camera batch instead of lax.map: required for data-parallel
    # sharding of the batch axis (scan is sequential and cannot shard).
    vmap_batch: bool = False


class Batch(NamedTuple):
    """A batch of B cameras, stacked on the leading axis.

    Two wire formats:
    - full: `gt_images` f32, `gt_lang`/`lang_mask` pre-gathered f32 maps
      (~14 MB/camera H2D at HyperNeRF scale);
    - compact: `gt_images` uint8 and the GT language channel as raw
      (`gt_seg` per-pixel segment ids, `gt_tables` per-segment features —
      the on-disk `*_s.npy`/`*_f.npy` representation, scene/cameras.py:92-118)
      with the per-pixel gather + u8->f32 decode done ON DEVICE by
      `materialize_batch` (~2.5 MB/camera H2D). The device tunnel's H2D
      bandwidth, not PNG decode, dominates the full-loop iteration time
      (PERF.md), so the wire diet is the host-pipeline win.
    """
    cams: CameraParams                   # arrays [B, ...]
    times: jnp.ndarray                   # [B]
    gt_images: jnp.ndarray               # [B, 3, H, W] f32 [0,1] — or uint8
    gt_lang: Optional[jnp.ndarray]       # [B, L, H, W], zeros, or None
    lang_mask: Optional[jnp.ndarray]     # [B, 1, H, W], ones, or None
    gt_seg: Optional[jnp.ndarray] = None     # [B, H, W] int; -1 = invalid
    gt_tables: Optional[jnp.ndarray] = None  # [B, S, L] per-segment features


def materialize_batch(batch: Batch) -> Batch:
    """Decode the compact wire format on device (jit-traceable).

    uint8 images -> f32/255 (exact inverse of the u8 quantization in
    build_batch); (gt_seg, gt_tables) -> per-pixel feature map + validity
    mask, the device-side equivalent of the host gather in
    Camera.get_language_feature (scene/cameras.py:105-118).
    """
    gt = batch.gt_images
    if gt.dtype == jnp.uint8:
        # true division (not *1/255): bit-identical to the host readers'
        # np.float32 k/255 values, so compact and full batches match exactly
        gt = gt.astype(jnp.float32) / jnp.float32(255.0)
    gt_lang, mask = batch.gt_lang, batch.lang_mask
    if batch.gt_seg is not None:
        seg = batch.gt_seg.astype(jnp.int32)                     # [B, H, W]
        mask = (seg >= 0)[:, None].astype(jnp.float32)           # [B,1,H,W]
        gathered = jax.vmap(lambda t, s: t[jnp.clip(s, 0)])(
            batch.gt_tables, seg)                                # [B,H,W,L]
        gt_lang = jnp.moveaxis(gathered, -1, 1) * mask           # [B,L,H,W]
    return batch._replace(gt_images=gt, gt_lang=gt_lang, lang_mask=mask,
                          gt_seg=None, gt_tables=None)


def _render_batch(cfg: StepConfig, params, num_active, aabb, batch: Batch,
                  bg, dummies, active_sh_degree: int):
    """Render all cameras sequentially (lax.map) with rematerialization."""
    from langsplat4d.core.state import GaussianState
    import dataclasses as _dc

    settings = _dc.replace(cfg.settings, sh_degree=active_sh_degree)
    # cfg.no_dlang governs both the graph (reference render(),
    # gaussian_renderer/__init__.py:121-124 sets args.no_dlang) and
    # trainability — keep the deformation config consistent with it.
    dcfg = _dc.replace(cfg.dcfg, no_dlang=cfg.no_dlang)
    cfg = cfg._replace(dcfg=dcfg)
    gs = GaussianState(
        xyz=params["xyz"], features_dc=params["f_dc"],
        features_rest=params["f_rest"], scaling=params["scaling"],
        rotation=params["rotation"], opacity=params["opacity"],
        language_feature=params["language_feature"], num_active=num_active)

    # No outer remat: composite_tiles already rematerializes its own
    # intermediates per tile-chunk (the only memory hog); saving the
    # deform/preprocess/binning activations (~100MB) avoids recomputing them
    # in the backward (~15% step time).
    def render_one(args):
        cam, time, dummy = args
        out = render(settings, cfg.dcfg, cfg.stage, cam, time, gs,
                     params["deform"], aabb, bg, means2d_dummy=dummy,
                     nonormalized=cfg.nonormalized)
        lang_img = out["language_feature_image"]
        if lang_img is None:
            lang_img = jnp.zeros((0,) + out["render"].shape[1:])
        return (out["render"], lang_img, out["radii"], out["coff"])

    if cfg.vmap_batch:
        renders = jax.vmap(render_one)((batch.cams, batch.times, dummies))
    else:
        renders = jax.lax.map(render_one, (batch.cams, batch.times, dummies))
    return renders


def _loss_fn(cfg: StepConfig, params, num_active, aabb, batch: Batch, bg,
             dummies, active_sh_degree: int):
    batch = materialize_batch(batch)
    images, lang_imgs, radii, coff = _render_batch(
        cfg, params, num_active, aabb, batch, bg, dummies, active_sh_degree)

    metrics: Dict[str, jnp.ndarray] = {}
    if "base" in cfg.stage:
        loss = losses.l1_loss(images, batch.gt_images[:, :3])
        metrics["rgb_l1"] = loss
    else:
        m = batch.lang_mask
        loss = cfg.lam * losses.l1_loss(lang_imgs * m, batch.gt_lang * m)
        metrics["lang_l1"] = loss
        if cfg.addcosloss:
            cl = losses.cos_loss(jnp.moveaxis(lang_imgs * m, 1, -1),
                                 jnp.moveaxis(batch.gt_lang * m, 1, -1))
            loss = loss + cfg.beta * cl
            metrics["cos"] = cl
        if cfg.joint_train:
            rgb_l1 = losses.l1_loss(images, batch.gt_images[:, :3])
            loss = loss + rgb_l1
            metrics["rgb_l1"] = rgb_l1

    # Plane regularization hook — preserved with the reference's dead guard
    # semantics handled by the caller (train.py:331-334).
    if cfg.time_smoothness_weight != 0.0:
        from langsplat4d.field.hexplane import compute_regulation
        loss = loss + compute_regulation(
            params["deform"]["grid"], cfg.time_smoothness_weight,
            cfg.l1_time_planes, cfg.plane_tv_weight)
    if cfg.lambda_dssim != 0.0:
        s = losses.ssim(images, batch.gt_images[:, :3])
        loss = loss + cfg.lambda_dssim * (1.0 - s)
        metrics["ssim"] = s

    metrics["loss"] = loss
    return loss, (metrics, radii)


#: packed per-camera row layout for train_step_packed: 16 viewmatrix +
#: 16 projmatrix + 3 campos + tanfovx + tanfovy + time + iteration = 39
#: f32 (iteration is f32-exact below 2^24 — far above any schedule).
PACKED_CAM_WIDTH = 39


def pack_cam_rows(cam_params_np, times, iteration) -> "np.ndarray":
    """Host-side [B, PACKED_CAM_WIDTH] f32 rows for train_step_packed: the
    per-iteration H2D payload collapses to ONE small upload instead of 6
    field uploads + a scalar (PERF.md: dispatch setup over the device
    tunnel dominates small-array transfers)."""
    import numpy as np
    rows = []
    for cp, t in zip(cam_params_np, times):
        rows.append(np.concatenate([
            np.asarray(cp.viewmatrix, np.float32).reshape(16),
            np.asarray(cp.projmatrix, np.float32).reshape(16),
            np.asarray(cp.campos, np.float32).reshape(3),
            np.float32([cp.tanfovx, cp.tanfovy, t, iteration])]))
    return np.stack(rows)


@partial(jax.jit, static_argnames=("cfg", "active_sh_degree"))
def train_step_packed(cfg: StepConfig, state: TrainState,
                      packed: jnp.ndarray,        # [B, PACKED_CAM_WIDTH]
                      imgs: Tuple[jnp.ndarray, ...],    # B x [3,H,W] u8/f32
                      segs: Optional[Tuple[jnp.ndarray, ...]],  # B x [H,W]
                      tables: Optional[Tuple[jnp.ndarray, ...]],  # B x [S,L]
                      bg: jnp.ndarray, active_sh_degree: int = 0):
    """Single-dispatch train step: camera matrices/times/iteration arrive as
    ONE packed host row per camera and the per-camera GT arrays as cached
    DEVICE references (data/gt_cache.py) — batch stacking, u8 decode and the
    seg-table gather all happen inside this jit. Replaces the eager
    per-iteration cascade (5 field uploads + 3 device stacks + an iteration
    upload + the step dispatch ~= 10 dispatches/it) with 1 upload + 1
    dispatch; the reference re-uploads everything per step
    (train.py:242-296)."""
    b = packed.shape[0]
    cams = CameraParams(
        viewmatrix=packed[:, :16].reshape(b, 4, 4),
        projmatrix=packed[:, 16:32].reshape(b, 4, 4),
        campos=packed[:, 32:35],
        tanfovx=packed[:, 35], tanfovy=packed[:, 36])
    times = packed[:, 37]
    iteration = packed[0, 38].astype(jnp.int32)
    if tables:
        # pad tables to the batch max segment count (static at trace time)
        s_max = max(t.shape[0] for t in tables)
        tables = [t if t.shape[0] == s_max
                  else jnp.pad(t, ((0, s_max - t.shape[0]), (0, 0)))
                  for t in tables]
    batch = Batch(
        cams=cams, times=times, gt_images=jnp.stack(imgs),
        gt_lang=None, lang_mask=None,
        gt_seg=jnp.stack(segs) if segs else None,
        gt_tables=jnp.stack(tables) if tables else None)
    return _train_step_body(cfg, state, batch, bg, iteration,
                            active_sh_degree)


@partial(jax.jit, static_argnames=("cfg", "active_sh_degree"))
def train_step(cfg: StepConfig, state: TrainState, batch: Batch,
               bg: jnp.ndarray, iteration: jnp.ndarray,
               active_sh_degree: int = 0,
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray],
                          jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (new_state, metrics, viewspace_grad_sum [cap,2],
    visibility_any [cap], radii_max [cap])."""
    return _train_step_body(cfg, state, batch, bg, iteration,
                            active_sh_degree)


def _train_step_body(cfg: StepConfig, state: TrainState, batch: Batch,
                     bg: jnp.ndarray, iteration: jnp.ndarray,
                     active_sh_degree: int = 0,
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray],
                                jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b = batch.gt_images.shape[0]
    dummies = jnp.zeros((b, state.capacity, 2), jnp.float32)

    grad_fn = jax.grad(_loss_fn, argnums=(1, 6), has_aux=True)
    (param_grads, dummy_grads), (metrics, radii) = grad_fn(
        cfg, state.params, state.num_active, state.aabb, batch, bg, dummies,
        active_sh_degree)

    # Manual viewspace grad summation across the batch (train.py:352-354).
    vs_grad = jnp.sum(dummy_grads, axis=0)            # [cap, 2]
    radii_max = jnp.max(radii, axis=0)                # [cap]
    visibility = radii_max > 0

    labels = label_tree(state.params)
    lrs = group_lrs(cfg.lr_cfg, iteration)
    lr_tree = jax.tree.map(lambda lbl: lrs[lbl], labels)
    train_tree = trainable_tree(
        state.params, cfg.stage, include_feature=True,
        joint_train=cfg.joint_train, no_dlang=cfg.no_dlang)

    new_params, new_opt = adam_update(state.params, param_grads, state.opt,
                                      lr_tree, train_tree)
    new_state = state.replace(params=new_params, opt=new_opt)
    return new_state, metrics, vs_grad, visibility, radii_max


def eval_step(cfg: StepConfig, state: TrainState, cam: CameraParams,
              time, bg, active_sh_degree: int = 0):
    """Single-camera forward for validation/report (no grads)."""
    import dataclasses as _dc
    settings = _dc.replace(cfg.settings, sh_degree=active_sh_degree)
    gs = state.gaussians()
    return render(settings, cfg.dcfg, cfg.stage, cam, time, gs,
                  state.params["deform"], state.aabb, bg,
                  nonormalized=cfg.nonormalized)
