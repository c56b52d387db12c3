"""Differentiable tile-based Gaussian rasterizer — TPU-native.

Replaces the reference's CUDA `4d-langsplat-rasterization` submodule (interface
documented at gaussian_renderer/__init__.py:49-63,219-228): alpha-composites
RGB + a language-feature channel block + depth in a single pass and is fully
differentiable (including language features) for the training loop.

TPU-first design instead of a CUDA translation:
- Preprocess (projection, EWA 2D covariance, SH eval) is batched jnp/vmap.
- Tile binning is scatter-free: a depth-rank top-k per tile yields each tile's
  front-to-back Gaussian list under XLA's static shapes (no device-side
  dynamic allocation / atomics, SURVEY §7 hard-part #1).
- Per-tile compositing runs as a `lax.scan` over fixed-size chunks whose
  transmittance-weighted feature reduction is a matmul (MXU). Early
  termination (T < 1e-4) and the alpha < 1/255 skip reproduce the CUDA
  semantics exactly via masking.
- The backward pass (incl. language-feature grads and the NDC-space viewspace
  gradients used for densification, train.py:352-354) falls out of jax.grad
  through the scan — no hand-written mirror kernel needed for correctness;
  Pallas fusion of the composite loop is a perf-only optimization layered on
  top (langsplat4d/ops/tile_composite.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from langsplat4d.core.sh import eval_sh
from langsplat4d.core.transforms import quat_to_rotmat

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99


@struct.dataclass
class CameraParams:
    """Per-camera device arrays (row-vector convention: p_hom @ M).

    viewmatrix/projmatrix are the transposed W2V / W2V@proj matrices exactly as
    the reference stores them (scene/cameras.py:62-66).
    """
    viewmatrix: jnp.ndarray   # [4,4]
    projmatrix: jnp.ndarray   # [4,4] full (view @ proj)
    campos: jnp.ndarray       # [3]
    tanfovx: jnp.ndarray      # []
    tanfovy: jnp.ndarray      # []


@dataclass(frozen=True)
class RasterSettings:
    """Static rasterization configuration (hashable jit argument).

    `lang_dim` is a static shape parameter — unlike the reference, where
    changing `language_feature_hiddendim` forces a CUDA extension rebuild
    (scripts/train_eval.sh:9-10).
    """
    image_height: int
    image_width: int
    sh_degree: int = 3
    lang_dim: int = 3
    include_feature: bool = True
    tile_size: int = 16
    tile_capacity: int = 1024
    bin_tile_chunk: int = 64        # tiles processed per top-k sweep
    composite_chunk: int = 128      # Gaussians per composite scan step
    composite_tile_chunk: int = 256  # tiles composited per sequential step
    # CUDA parity cutoffs (alpha >= 1/255, T >= 1e-4 early stop). Disable for
    # finite-difference gradient validation — the cutoffs are step
    # discontinuities that FD cannot cross.
    hard_cutoffs: bool = True

    @property
    def tiles_x(self) -> int:
        return -(-self.image_width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.image_height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def preprocess(
    settings: RasterSettings,
    cam: CameraParams,
    means3d: jnp.ndarray,       # [N,3]
    means2d_dummy: jnp.ndarray,  # [N,2] zeros; NDC-space grad tap
    opacities: jnp.ndarray,     # [N,1] post-sigmoid
    scales: jnp.ndarray,        # [N,3] post-exp
    rotations: jnp.ndarray,     # [N,4]
    shs: Optional[jnp.ndarray],        # [N,K,3] or None
    colors_precomp: Optional[jnp.ndarray],  # [N,3] or None
    cov3d_precomp: Optional[jnp.ndarray] = None,  # [N,6] or None
    active: Optional[jnp.ndarray] = None,  # [N] bool
):
    """Project Gaussians to screen space; returns per-Gaussian render attrs.

    Semantics mirror the CUDA preprocess (frustum cull at view z <= 0.2, EWA
    covariance with +0.3 low-pass dilation, 3-sigma radius, SH clamped at 0).
    """
    n = means3d.shape[0]
    h, w = settings.image_height, settings.image_width
    focal_x = w / (2.0 * cam.tanfovx)
    focal_y = h / (2.0 * cam.tanfovy)

    # Camera transforms and covariance products run at HIGHEST matmul
    # precision: on TPU the default MXU precision is bf16, whose ~0.3%
    # relative error visibly shifts projected centers/conics (amplified by
    # exp() in alpha).
    hp = jax.lax.Precision.HIGHEST
    ones = jnp.ones((n, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)
    p_view = jnp.matmul(p_hom4, cam.viewmatrix, precision=hp)   # [N,4]
    depth = p_view[:, 2]

    p_proj_hom = jnp.matmul(p_hom4, cam.projmatrix, precision=hp)  # [N,4]
    p_w = 1.0 / (p_proj_hom[:, 3] + 1e-7)
    p_ndc = p_proj_hom[:, :3] * p_w[:, None]
    # Differentiable 2D-mean tap: dummy added in NDC so its gradient matches
    # the CUDA dL_dmean2D scale used by the densify threshold (train.py:391).
    ndc_xy = p_ndc[:, :2] + means2d_dummy
    point_image = ((ndc_xy + 1.0) * jnp.asarray([w, h], means3d.dtype) - 1.0) * 0.5

    # --- 3D covariance ---
    if cov3d_precomp is not None:
        c3 = cov3d_precomp
        cov3d = jnp.stack([
            c3[:, 0], c3[:, 1], c3[:, 2],
            c3[:, 1], c3[:, 3], c3[:, 4],
            c3[:, 2], c3[:, 4], c3[:, 5],
        ], axis=-1).reshape(n, 3, 3)
    else:
        R = quat_to_rotmat(rotations)
        L = R * scales[:, None, :]
        cov3d = jnp.matmul(L, jnp.swapaxes(L, 1, 2), precision=hp)

    # --- EWA projection to 2D ---
    tz = p_view[:, 2]
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = p_view[:, 0] / tz
    tytz = p_view[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        focal_x / tz, zero, -(focal_x * tx) / (tz * tz),
        zero, focal_y / tz, -(focal_y * ty) / (tz * tz),
    ], axis=-1).reshape(n, 2, 3)
    # Camera-from-world rotation: rows of W2V = columns of the stored
    # (transposed) viewmatrix.
    R_wc = cam.viewmatrix[:3, :3].T
    T = jnp.matmul(J, R_wc, precision=hp)       # [N,2,3]
    cov2d = jnp.matmul(jnp.matmul(T, cov3d, precision=hp),
                       jnp.swapaxes(T, 1, 2), precision=hp)  # [N,2,2]
    cxx = cov2d[:, 0, 0] + 0.3
    cyy = cov2d[:, 1, 1] + 0.3
    cxy = cov2d[:, 0, 1]

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    visible = (depth > 0.2) & (det != 0.0)
    if active is not None:
        visible = visible & active
    # Off-screen cull: zero-area tile rectangle (CUDA getRect semantics).
    ts = settings.tile_size
    rect_min_x = jnp.clip(((point_image[:, 0] - radius) / ts), 0, settings.tiles_x)
    rect_max_x = jnp.clip(((point_image[:, 0] + radius + ts - 1) / ts), 0, settings.tiles_x)
    rect_min_y = jnp.clip(((point_image[:, 1] - radius) / ts), 0, settings.tiles_y)
    rect_max_y = jnp.clip(((point_image[:, 1] + radius + ts - 1) / ts), 0, settings.tiles_y)
    rect_min = jnp.stack([jnp.floor(rect_min_x), jnp.floor(rect_min_y)], -1)
    rect_max = jnp.stack([jnp.floor(rect_max_x), jnp.floor(rect_max_y)], -1)
    span = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    visible = visible & (span > 0)
    radii = jnp.where(visible, radius, 0.0)

    # --- colors ---
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dirs = means3d - cam.campos[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = eval_sh(settings.sh_degree, jnp.swapaxes(shs, 1, 2), dirs)
        colors = jnp.maximum(rgb + 0.5, 0.0)

    return dict(
        point_image=point_image, conic=conic, depth=depth,
        opacity=opacities[:, 0], radii=radii, visible=visible,
        rect_min=rect_min, rect_max=rect_max, colors=colors,
    )


def bin_tiles(settings: RasterSettings, prep: Dict[str, jnp.ndarray]):
    """Per-tile front-to-back Gaussian lists via depth-rank top-k.

    Returns (entries [T, K] int32 indices into the original arrays, valid
    [T, K] bool). Scatter-free: for each tile the score of Gaussian g is
    -depth_rank(g) if g's rect covers the tile else -inf; top-k recovers the
    first K covering Gaussians already in depth order.
    """
    # Binning is pure integer selection — no gradients flow through it.
    prep = jax.lax.stop_gradient(prep)
    n = prep["depth"].shape[0]
    k = settings.tile_capacity
    depth_sorted = jnp.where(prep["visible"], prep["depth"], jnp.inf)
    order = jnp.argsort(depth_sorted)                 # [N] front-to-back
    rank_of = jnp.argsort(order).astype(jnp.float32)  # rank[g] in depth order

    tiles = jnp.arange(settings.num_tiles, dtype=jnp.int32)
    tx = (tiles % settings.tiles_x).astype(jnp.float32)
    ty = (tiles // settings.tiles_x).astype(jnp.float32)

    rect_min, rect_max = prep["rect_min"], prep["rect_max"]
    visible = prep["visible"]

    chunk = settings.bin_tile_chunk
    num_chunks = -(-settings.num_tiles // chunk)
    pad_tiles = num_chunks * chunk
    tx = jnp.pad(tx, (0, pad_tiles - settings.num_tiles))
    ty = jnp.pad(ty, (0, pad_tiles - settings.num_tiles))

    def tile_chunk(ci):
        cx = jax.lax.dynamic_slice(tx, (ci * chunk,), (chunk,))
        cy = jax.lax.dynamic_slice(ty, (ci * chunk,), (chunk,))
        covers = (
            (rect_min[None, :, 0] <= cx[:, None]) & (cx[:, None] < rect_max[None, :, 0])
            & (rect_min[None, :, 1] <= cy[:, None]) & (cy[:, None] < rect_max[None, :, 1])
            & visible[None, :]
        )  # [chunk, N]
        score = jnp.where(covers, -rank_of[None, :], -jnp.inf)
        k_eff = min(k, score.shape[1])
        top_scores, top_idx = jax.lax.top_k(score, k_eff)  # descending ->
        # depth order
        if k_eff < k:
            top_idx = jnp.pad(top_idx, ((0, 0), (0, k - k_eff)))
            top_scores = jnp.pad(top_scores, ((0, 0), (0, k - k_eff)),
                                 constant_values=-jnp.inf)
        return top_idx.astype(jnp.int32), top_scores > -jnp.inf

    idx, valid = jax.lax.map(tile_chunk, jnp.arange(num_chunks))
    entries = idx.reshape(pad_tiles, k)[: settings.num_tiles]
    valid = valid.reshape(pad_tiles, k)[: settings.num_tiles]
    return entries, valid


def composite_tiles(
    settings: RasterSettings,
    prep: Dict[str, jnp.ndarray],
    entries: jnp.ndarray,   # [T, K]
    valid: jnp.ndarray,     # [T, K]
    features: jnp.ndarray,  # [N, C] extra channels composited like color
    bg: jnp.ndarray,        # [3]
):
    """Front-to-back alpha compositing for all tiles.

    Output channels: [rgb(3) | features(C) | depth(1) | alpha(1)] per pixel.
    The per-chunk weighted reduction `feats^T @ weights` is an MXU matmul.

    Tiles are processed in sequential chunks (`composite_tile_chunk`) under
    `jax.checkpoint`, so forward intermediates for a chunk are rematerialized
    in the backward instead of stored — this bounds peak HBM at
    O(tile_chunk * composite_chunk * px) instead of O(num_tiles * ...).
    """
    ts = settings.tile_size
    k = settings.tile_capacity
    g = settings.composite_chunk
    tc = settings.composite_tile_chunk
    num_t = settings.num_tiles
    px = ts * ts

    point_image = prep["point_image"]
    conic = prep["conic"]
    opacity = prep["opacity"]
    depth = prep["depth"]
    colors = prep["colors"]

    feat_all = jnp.concatenate(
        [colors, features, depth[:, None]], axis=1)   # [N, 3+C+1]
    c_all = feat_all.shape[1]

    # Pad tiles to a chunk multiple; padded tiles read list slot entries that
    # are marked invalid, so they composite to background only.
    n_chunks_t = -(-num_t // tc)
    pad_t = n_chunks_t * tc
    tiles = jnp.arange(pad_t, dtype=jnp.int32)
    tile_ox = ((tiles % settings.tiles_x) * ts).astype(jnp.float32)
    tile_oy = ((tiles // settings.tiles_x) * ts).astype(jnp.float32)
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), ts)            # [px]
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)          # [px]
    pix_x = (tile_ox[:, None] + lx[None, :]).reshape(n_chunks_t, tc, px)
    pix_y = (tile_oy[:, None] + ly[None, :]).reshape(n_chunks_t, tc, px)

    num_chunks_g = k // g
    entries_p = jnp.pad(entries, ((0, pad_t - num_t), (0, 0)))
    valid_p = jnp.pad(valid, ((0, pad_t - num_t), (0, 0)))
    entries_c = entries_p.reshape(n_chunks_t, tc, num_chunks_g, g)
    valid_c = valid_p.reshape(n_chunks_t, tc, num_chunks_g, g)

    @jax.checkpoint
    def one_tile_chunk(args):
        ent, vldall, pxx, pxy = args  # [tc,Cg,g],[tc,Cg,g],[tc,px],[tc,px]

        def scan_step(carry, ci):
            T_carry, accum = carry   # [tc,px], [tc,c_all+1,px]
            idx = jax.lax.dynamic_index_in_dim(ent, ci, axis=1, keepdims=False)
            vld = jax.lax.dynamic_index_in_dim(vldall, ci, axis=1,
                                               keepdims=False)
            xy = point_image[idx]        # [tc,g,2]
            con = conic[idx]             # [tc,g,3]
            op = opacity[idx]            # [tc,g]
            ft = feat_all[idx]           # [tc,g,c_all]

            dx = xy[..., 0:1] - pxx[:, None, :]   # [tc,g,px]
            dy = xy[..., 1:2] - pxy[:, None, :]
            power = (-0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
                     - con[..., 1:2] * dx * dy)
            alpha = jnp.minimum(MAX_ALPHA, op[..., None] * jnp.exp(power))
            kill = (power > 0.0) | (~vld[..., None])
            if settings.hard_cutoffs:
                kill = kill | (alpha < ALPHA_MIN)
            alpha = jnp.where(kill, 0.0, alpha)

            one_m = 1.0 - alpha                                   # [tc,g,px]
            if settings.hard_cutoffs:
                # Raw transmittance decides the stop test; the carried T only
                # multiplies *included* alphas — exact CUDA early-out
                # semantics.
                cum_raw = jnp.cumprod(one_m, axis=1)              # T after i
                t_after_raw = T_carry[:, None, :] * cum_raw
                include = t_after_raw >= T_EPS
                eff_alpha = jnp.where(include, alpha, 0.0)
            else:
                eff_alpha = alpha
            cum_eff = jnp.cumprod(1.0 - eff_alpha, axis=1)
            t_before = T_carry[:, None, :] * jnp.concatenate(
                [jnp.ones_like(cum_eff[:, :1]), cum_eff[:, :-1]], axis=1)
            weights = eff_alpha * t_before                        # [tc,g,px]

            contrib = jnp.einsum("tgc,tgp->tcp", ft, weights,
                                 precision=jax.lax.Precision.HIGHEST)
            alpha_sum = jnp.sum(weights, axis=1)[:, None, :]      # [tc,1,px]
            accum = accum + jnp.concatenate([contrib, alpha_sum], axis=1)
            T_new = T_carry * cum_eff[:, -1, :]
            return (T_new, accum), None

        T0 = jnp.ones((tc, px), jnp.float32)
        acc0 = jnp.zeros((tc, c_all + 1, px), jnp.float32)
        (T_fin, accum), _ = jax.lax.scan(scan_step, (T0, acc0),
                                         jnp.arange(num_chunks_g))
        # Background blend for RGB only (CUDA adds T*bg to color channels).
        accum = accum.at[:, :3, :].add(T_fin[:, None, :] * bg[None, :, None])
        return accum, T_fin

    accum, T_final = jax.lax.map(one_tile_chunk,
                                 (entries_c, valid_c, pix_x, pix_y))
    accum = accum.reshape(pad_t, c_all + 1, px)[:num_t]
    T_final = T_final.reshape(pad_t, px)[:num_t]

    # [T, C, px] -> [C, H, W]
    c_out = c_all + 1
    img = accum.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    img = img[:, : settings.image_height, : settings.image_width]
    return img, T_final


def rasterize(
    settings: RasterSettings,
    cam: CameraParams,
    means3d: jnp.ndarray,
    means2d_dummy: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    colors_precomp: Optional[jnp.ndarray],
    language_features: jnp.ndarray,   # [N, L]
    bg: jnp.ndarray,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
):
    """Full forward. Returns (rendered_image [3,H,W],
    language_feature_image [L,H,W], radii [N], depth [1,H,W]) — the CUDA
    rasterizer's return signature (gaussian_renderer/__init__.py:219-228).
    """
    prep = preprocess(settings, cam, means3d, means2d_dummy, opacities, scales,
                      rotations, shs, colors_precomp, cov3d_precomp, active)
    entries, valid = bin_tiles(settings, prep)
    feats = language_features if settings.include_feature else (
        jnp.zeros((means3d.shape[0], 0), means3d.dtype))
    img, _ = composite_tiles(settings, prep, entries, valid, feats, bg)
    c_lang = feats.shape[1]
    rendered = img[:3]
    lang_img = img[3:3 + c_lang]
    depth_img = img[3 + c_lang:4 + c_lang]
    return rendered, lang_img, prep["radii"], depth_img
