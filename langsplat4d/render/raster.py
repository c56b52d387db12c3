"""Differentiable tile-based Gaussian rasterizer — TPU-native.

Replaces the reference's CUDA `4d-langsplat-rasterization` submodule (interface
documented at gaussian_renderer/__init__.py:49-63,219-228): alpha-composites
RGB + a language-feature channel block + depth in a single pass and is fully
differentiable (including language features) for the training loop.

TPU-first design instead of a CUDA translation:
- Preprocess (projection, EWA 2D covariance, SH eval) is batched jnp/vmap.
- Tile binning is scatter-free and separable: a -depth top-k selects each
  y-band's candidates (top_k returns them depth-sorted), then stable
  variadic sorts compact bands into cells, cells into tile rows, and tile
  rows into tiles — per-axis interval tests, payloads carried by the sort,
  all under XLA's static shapes (no device-side dynamic allocation /
  atomics, SURVEY §7 hard-part #1).
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
    # Two-level binning: coarse cells of `bin_cell_tiles` x `bin_cell_tiles`
    # tiles prefilter Gaussians (capacity `cell_capacity`), then per-tile
    # selection runs over the cell list instead of all N. Cuts binning work by
    # ~N/cell_capacity. Off -> direct per-tile top-k over all N.
    two_level_binning: bool = True
    bin_cell_tiles: int = 8
    cell_capacity: int = 8192
    # Stage-1 capacity of bin_cells' horizontal band lists (a band is one row
    # of cells, i.e. a bin_cell_tiles*tile_size-pixel-tall image strip). Must
    # exceed the number of visible Gaussians intersecting any one band, or
    # the farthest ones are dropped (same truncation semantics as
    # cell_capacity/tile_capacity).
    band_capacity: int = 65536
    # Capacity of the per-tile-row (y-compacted) lists inside each cell in
    # bin_tiles' separable stage; bounds the Gaussians intersecting one
    # tile_size-pixel-tall strip of a cell.
    tile_row_capacity: int = 2048
    # Fused Pallas compositing (forward-only fast path; training uses the jnp
    # formulation whose autodiff backward is golden-tested).
    pallas_composite: bool = False
    pallas_tile_block: int = 8
    # Cell-list compositing: skip the per-tile binning stage entirely; each
    # tile walks its cell's depth-ordered candidates inside the Pallas kernel
    # with the rect cull fused (no capacity-K truncation). Implies
    # pallas_composite.
    pallas_cell_composite: bool = False
    # Stream binning (render/stream.py): global duplicate+sort tile
    # assignment with packed rows carried as sort payloads, composited by the
    # ragged-segment Pallas kernel. Replaces bin_cells/bin_tiles/pack
    # entirely; work scales with actual (Gaussian, tile) pairs. Tier
    # capacities below bound the static emission shapes (stream_overflow
    # reports any clipping).
    stream_binning: bool = False
    # (span, capacity) tiers after the implicit (2, N) base tier; sort cost
    # is linear in emitted slots, so spans should hug the scene's splat-size
    # distribution (stream_overflow reports per-tier demand)
    stream_tiers: tuple = ((3, 32768), (6, 4096), (16, 256))
    # Narrow-sort stream build (render/stream.py build_stream_narrow): sort
    # only (packed tile|depth-rank key, src) and materialize the packed rows
    # with one budgeted Morton-local row gather afterwards — the sort cost
    # no longer scales with the 12 payload columns, which is what makes
    # EXACT (autotuned-tier) coverage affordable on trained-checkpoint
    # span distributions. stream_budget bounds the gathered row count
    # (driver sizes it from the audited pair count; 0 = disabled).
    stream_narrow_sort: bool = False
    stream_budget: int = 0
    # Single-column key sort in the narrow build (default): the key's rank
    # bits index a rank-ordered row table, so no src payload rides the sort
    # and the budget gather's indices ascend within every tile segment
    # (locality). Off -> legacy (key, src) 2-column sort.
    stream_single_key: bool = True
    # Invalidate emitted slots whose tile lies wholly outside the
    # alpha >= 1/255 ellipse (exactness-preserving: the compositor applies
    # the same cutoff per pixel).
    stream_ellipse_cull: bool = True
    # Morton-reorder the narrow build's row table (locality of the budgeted
    # gather vs one argsort + inverse scatter + [N,16] gather of build cost).
    # A/B on the trained-checkpoint-realistic Neu3D-scale scene measured the
    # reorder as a net LOSS (24.4 FPS with vs 27.0 without), so off by
    # default; LS4D_STREAM_MORTON=1 re-enables it per run.
    stream_morton: bool = False
    # Stream-binned TRAINING path (render/stream_vjp.py): differentiable
    # chunk-aligned stream composite with the fused analytic fwd/bwd pallas
    # pair — replaces bin_tiles + the [T*K]-row gather/scatter of the
    # tile-list analytic VJP. Needs stream_budget > 0 (sized by the loop);
    # stream_train_chunk is the aligned chunk width (the pallas grid unit).
    stream_train: bool = False
    stream_train_chunk: int = 128
    # Analytic custom-VJP compositing for training (hand-derived backward,
    # ~2x faster than autodiff through the scan; gradient-equality tested).
    analytic_vjp: bool = True
    # Run the analytic-VJP primal as the fused Pallas kernel (TPU; the
    # backward recomputes its sweep from `packed`, so no scan residuals are
    # needed). CPU/test paths keep the jnp scan.
    vjp_pallas_forward: bool = False
    # Run the analytic backward as the fused Pallas sweep too (per-entry
    # gradient rows in VMEM + one scatter-add).
    vjp_pallas_backward: bool = False
    # Backward grad reduction: sort-by-id + segmented cumsum instead of the
    # per-chunk scatter-adds. Measured SLOWER at HyperNeRF training scale
    # (143 vs 129 ms/it — the stacked per-chunk gradient rows cost more than
    # the scatters they replace); kept as an option for other workloads.
    vjp_sort_scatter: bool = False

    @property
    def cells_x(self) -> int:
        return -(-self.tiles_x // self.bin_cell_tiles)

    @property
    def cells_y(self) -> int:
        return -(-self.tiles_y // self.bin_cell_tiles)

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

    # TPU layout note: all per-Gaussian math runs in transposed
    # struct-of-rows layout [C, N] — N on the 128-lane axis — so the VPU sees
    # full rows instead of [N, 3]-style arrays padded 3->128 lanes (a 42x
    # memory-traffic blowup), and the 4x4 camera transforms become explicit
    # scalar-coefficient FMA chains (fp32-exact; no MXU precision concerns,
    # no batched tiny matmuls).
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V = cam.viewmatrix   # row-vector convention: p_hom @ V
    P = cam.projmatrix

    def xform_row(M, col):
        return mx * M[0, col] + my * M[1, col] + mz * M[2, col] + M[3, col]

    pv_x = xform_row(V, 0)
    pv_y = xform_row(V, 1)
    depth = xform_row(V, 2)

    pp_x = xform_row(P, 0)
    pp_y = xform_row(P, 1)
    pp_w = xform_row(P, 3)
    inv_w = 1.0 / (pp_w + 1e-7)
    # Differentiable 2D-mean tap: dummy added in NDC so its gradient matches
    # the CUDA dL_dmean2D scale used by the densify threshold (train.py:391).
    ndc_x = pp_x * inv_w + means2d_dummy[:, 0]
    ndc_y = pp_y * inv_w + means2d_dummy[:, 1]
    pi_x = ((ndc_x + 1.0) * w - 1.0) * 0.5
    pi_y = ((ndc_y + 1.0) * h - 1.0) * 0.5

    # --- 3D covariance (6 unique entries as rows) ---
    if cov3d_precomp is not None:
        c3 = cov3d_precomp
        s_xx, s_xy, s_xz = c3[:, 0], c3[:, 1], c3[:, 2]
        s_yy, s_yz, s_zz = c3[:, 3], c3[:, 4], c3[:, 5]
    else:
        # R from normalized quat, L = R * diag(scales), Sigma = L L^T
        # (normalization mirrors quat_to_rotmat / reference build_rotation).
        q_inv = jax.lax.rsqrt(jnp.sum(rotations * rotations, axis=-1))
        qr, qx, qy, qz = (rotations[:, 0] * q_inv, rotations[:, 1] * q_inv,
                          rotations[:, 2] * q_inv, rotations[:, 3] * q_inv)
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qr * qz)
        r02 = 2 * (qx * qz + qr * qy)
        r10 = 2 * (qx * qy + qr * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qr * qx)
        r20 = 2 * (qx * qz - qr * qy)
        r21 = 2 * (qy * qz + qr * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
        l00, l01, l02 = r00 * s0, r01 * s1, r02 * s2
        l10, l11, l12 = r10 * s0, r11 * s1, r12 * s2
        l20, l21, l22 = r20 * s0, r21 * s1, r22 * s2
        s_xx = l00 * l00 + l01 * l01 + l02 * l02
        s_xy = l00 * l10 + l01 * l11 + l02 * l12
        s_xz = l00 * l20 + l01 * l21 + l02 * l22
        s_yy = l10 * l10 + l11 * l11 + l12 * l12
        s_yz = l10 * l20 + l11 * l21 + l12 * l22
        s_zz = l20 * l20 + l21 * l21 + l22 * l22

    # --- EWA projection to 2D ---
    tz = depth
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    inv_tz = 1.0 / tz
    tx = jnp.clip(pv_x * inv_tz, -limx, limx) * tz
    ty = jnp.clip(pv_y * inv_tz, -limy, limy) * tz

    # J rows: [fx/tz, 0, -fx*tx/tz^2; 0, fy/tz, -fy*ty/tz^2]
    j00 = focal_x * inv_tz
    j02 = -(focal_x * tx) * (inv_tz * inv_tz)
    j11 = focal_y * inv_tz
    j12 = -(focal_y * ty) * (inv_tz * inv_tz)
    # Camera-from-world rotation: rows of W2V = columns of the stored
    # (transposed) viewmatrix, i.e. R_wc[b][c] = V[c, b];
    # T[a][c] = sum_b J[a][b] * R_wc[b][c] (J[0][1] = J[1][0] = 0).
    t00 = j00 * V[0, 0] + j02 * V[0, 2]
    t01 = j00 * V[1, 0] + j02 * V[1, 2]
    t02 = j00 * V[2, 0] + j02 * V[2, 2]
    t10 = j11 * V[0, 1] + j12 * V[0, 2]
    t11 = j11 * V[1, 1] + j12 * V[1, 2]
    t12 = j11 * V[2, 1] + j12 * V[2, 2]

    # cov2d = T Sigma T^T (2x2 symmetric; 3 unique rows)
    u0 = t00 * s_xx + t01 * s_xy + t02 * s_xz
    u1 = t00 * s_xy + t01 * s_yy + t02 * s_yz
    u2 = t00 * s_xz + t01 * s_yz + t02 * s_zz
    v0 = t10 * s_xx + t11 * s_xy + t12 * s_xz
    v1 = t10 * s_xy + t11 * s_yy + t12 * s_yz
    v2 = t10 * s_xz + t11 * s_yz + t12 * s_zz
    cxx = u0 * t00 + u1 * t01 + u2 * t02 + 0.3
    cxy = u0 * t10 + u1 * t11 + u2 * t12
    cyy = v0 * t10 + v1 * t11 + v2 * t12 + 0.3

    det = cxx * cyy - cxy * cxy
    # f32-overflow cull: a runaway Gaussian (log-scale ~20+ drives cov2d
    # past 3.4e38) turns det into inf and conic into inf*0 = NaN, and
    # `det != 0` does NOT catch it — one such Gaussian NaN-poisons the whole
    # frame AND, through the backward, the deformation MLP (observed in
    # training: watchdog trip at a deterministic iteration). The CUDA
    # reference has the same f32 blowup and answers it with its execv
    # watchdog (train.py:341-351); here the Gaussian is culled with zero
    # gradient instead — it stops receiving updates and training continues.
    num_ok = (jnp.isfinite(det) & jnp.isfinite(cxx) & jnp.isfinite(cyy)
              & jnp.isfinite(cxy))
    cxx = jnp.where(num_ok, cxx, 1.0)
    cyy = jnp.where(num_ok, cyy, 1.0)
    cxy = jnp.where(num_ok, cxy, 0.0)
    det = jnp.where(num_ok, det, 1.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    visible = (depth > 0.2) & (det != 0.0) & num_ok
    if active is not None:
        visible = visible & active

    # Binning bounds. The CUDA reference bins the square 3*sqrt(lambda_max)
    # rect (getRect). With the hard cutoffs on, any pixel whose alpha falls
    # below 1/255 is killed by the compositor anyway, so tighter bounds that
    # only exclude such pixels are image-exact while shrinking every
    # downstream per-tile list:
    # - opacity-aware reach: op * exp(power) >= 1/255 requires
    #   -2*power <= t2 := 2*ln(255*op), capped at 2*ln(255) (op <= 1), so the
    #   rect covers EVERY pixel with alpha >= 1/255 — including the q in
    #   (9, 2*ln 255) ring that the reference's 3-sigma square only partially
    #   reaches (its corners);
    # - per-axis marginals: max over the other axis of the quadratic form at
    #   offset dx is dx^2 / cov_xx (the marginal variance), so the tight
    #   per-axis half-extents are sqrt(t2 * cov_xx), sqrt(t2 * cov_yy) —
    #   separable, and <= the isotropic sqrt(t2 * lambda_max).
    if settings.hard_cutoffs:
        t2 = 2.0 * jnp.log(jnp.maximum(opacities[:, 0], 1e-30) * 255.0)
        t2 = jnp.clip(t2, 0.0, 2.0 * jnp.log(255.0))
        bound_x = jnp.sqrt(t2 * jnp.maximum(cxx, 0.0))
        bound_y = jnp.sqrt(t2 * jnp.maximum(cyy, 0.0))
        reachable = t2 > 0.0
    else:
        # FD-gradient validation mode: cutoffs off, every binned Gaussian
        # contributes — keep the reference's conservative square rect.
        bound_x = bound_y = radius
        reachable = jnp.ones_like(visible)

    # Off-screen cull: zero-area tile rectangle (CUDA getRect semantics).
    ts = settings.tile_size
    binnable = visible & reachable
    rmin_x = jnp.floor(jnp.clip((pi_x - bound_x) / ts, 0, settings.tiles_x))
    rmax_x = jnp.floor(jnp.clip((pi_x + bound_x + ts - 1) / ts, 0,
                                settings.tiles_x))
    rmin_y = jnp.floor(jnp.clip((pi_y - bound_y) / ts, 0, settings.tiles_y))
    rmax_y = jnp.floor(jnp.clip((pi_y + bound_y + ts - 1) / ts, 0,
                                settings.tiles_y))
    rmin_x = jnp.where(binnable, rmin_x, 0.0)
    rmax_x = jnp.where(binnable, rmax_x, 0.0)
    rmin_y = jnp.where(binnable, rmin_y, 0.0)
    rmax_y = jnp.where(binnable, rmax_y, 0.0)
    span = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    visible = visible & (span > 0)
    radii = jnp.where(visible, radius, 0.0)

    # --- colors ---
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dx = mx - cam.campos[0]
        dy = my - cam.campos[1]
        dz = mz - cam.campos[2]
        inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dirs = jnp.stack([dx * inv_n, dy * inv_n, dz * inv_n], axis=-1)
        rgb = eval_sh(settings.sh_degree, jnp.swapaxes(shs, 1, 2), dirs)
        colors = jnp.maximum(rgb + 0.5, 0.0)

    point_image = jnp.stack([pi_x, pi_y], axis=-1)
    rect_min = jnp.stack([rmin_x, rmin_y], axis=-1)
    rect_max = jnp.stack([rmax_x, rmax_y], axis=-1)
    return dict(
        point_image=point_image, conic=conic, depth=depth,
        opacity=opacities[:, 0], radii=radii, visible=visible,
        rect_min=rect_min, rect_max=rect_max, colors=colors,
    )


def _topk_padded(score: jnp.ndarray, k: int):
    """top_k along the last axis, padded with -inf columns if k > width."""
    k_eff = min(k, score.shape[-1])
    top_scores, top_idx = jax.lax.top_k(score, k_eff)
    if k_eff < k:
        pad = [(0, 0)] * (score.ndim - 1) + [(0, k - k_eff)]
        top_idx = jnp.pad(top_idx, pad)
        top_scores = jnp.pad(top_scores, pad, constant_values=-jnp.inf)
    return top_scores, top_idx.astype(jnp.int32)


def pack_rects(rect_min: jnp.ndarray, rect_max: jnp.ndarray) -> jnp.ndarray:
    """Pack a tile-space rect into one int32 (8 bits/coordinate; tile grids
    are < 256 on a side at up to ~4K resolution)."""
    return (rect_min[:, 0].astype(jnp.int32)
            | (rect_min[:, 1].astype(jnp.int32) << 8)
            | (rect_max[:, 0].astype(jnp.int32) << 16)
            | (rect_max[:, 1].astype(jnp.int32) << 24))


def bin_cells(settings: RasterSettings, prep: Dict[str, jnp.ndarray],
              key: Optional[jnp.ndarray] = None):
    """Coarse binning: depth-ordered candidate lists per cell of
    bin_cell_tiles^2 tiles, built separably (y bands, then x compaction).

    Returns (cell_entries [n_cells, kc] int32, cell_valid [n_cells, kc] bool,
    cell_rect [n_cells, kc] int32 packed tile-rects of the entries).

    `key` is a front-to-back selection score (higher = nearer): -depth for
    visible Gaussians, -inf otherwise. top_k returns its result sorted by
    score, so the lists come out front-to-back directly — no global
    depth-rank argsort needed.

    Separable two-stage build (the intersection test factors per axis):
    1. y: one top_k over [cells_y, N] selects each horizontal band's nearest
       `band_capacity` Gaussians whose tile-rect meets the band.
    2. x: a stable variadic sort on the x-intersection mask compacts each
       band list into its cells, carrying ids and packed rects along — so
       the per-cell rects need no payload gather afterwards.
    This drops the mask work from O(n_cells * N) to
    O(cells_y * N + n_cells * band_capacity): ~2.4x faster at Neu3D scale
    (XLA element gathers and [n_cells, N] broadcasts are the TPU costs here;
    top_k itself lowers to a fast custom call).
    """
    prep = jax.lax.stop_gradient(prep)
    if key is None:
        key = jnp.where(prep["visible"], -prep["depth"], -jnp.inf)
    rect_min, rect_max = prep["rect_min"], prep["rect_max"]
    cell = settings.bin_cell_tiles
    kc = settings.cell_capacity
    kr = settings.band_capacity
    rect_packed = pack_rects(rect_min, rect_max)

    # --- stage 1: horizontal bands of cells (y-axis test only) ---
    band_y0 = jnp.arange(settings.cells_y, dtype=rect_min.dtype) * cell
    in_band = ((rect_min[None, :, 1] < band_y0[:, None] + cell)
               & (rect_max[None, :, 1] > band_y0[:, None]))      # [Ry, N]
    band_scores, band_entries = _topk_padded(
        jnp.where(in_band, key[None, :], -jnp.inf), kr)          # [Ry, kr]
    band_valid = band_scores > -jnp.inf
    band_rect = rect_packed[band_entries.reshape(-1)].reshape(
        settings.cells_y, kr)

    # --- stage 2: compact each band into its cells (x-axis test) ---
    cx0 = jnp.arange(settings.cells_x, dtype=jnp.int32) * cell
    rminx = (band_rect & 0xFF)[:, None, :]
    rmaxx = ((band_rect >> 16) & 0xFF)[:, None, :]
    covers = ((rminx < cx0[None, :, None] + cell)
              & (rmaxx > cx0[None, :, None])
              & band_valid[:, None, :])                          # [Ry, Cx, kr]
    sk = jnp.where(covers, jnp.int32(0), jnp.int32(1))
    ids_b = jnp.broadcast_to(band_entries[:, None, :], covers.shape)
    rect_b = jnp.broadcast_to(band_rect[:, None, :], covers.shape)
    sks, ents, rects = jax.lax.sort(
        (sk, ids_b, rect_b), dimension=-1, is_stable=True, num_keys=1)
    if kc > kr:  # cell capacity exceeds the band list: pad with invalid
        pad = [(0, 0), (0, 0), (0, kc - kr)]
        sks = jnp.pad(sks, pad, constant_values=1)
        ents, rects = jnp.pad(ents, pad), jnp.pad(rects, pad)
    n_cells = settings.cells_y * settings.cells_x
    return (ents[..., :kc].reshape(n_cells, kc),
            (sks[..., :kc] == 0).reshape(n_cells, kc),
            rects[..., :kc].reshape(n_cells, kc))


def bin_tiles(settings: RasterSettings, prep: Dict[str, jnp.ndarray]):
    """Per-tile front-to-back Gaussian lists via separable selection.

    Returns (entries [T, K] int32 indices into the original arrays, valid
    [T, K] bool). Scatter-free: for each tile the score of Gaussian g is
    -depth_rank(g) if g's rect covers the tile else -inf; top-k recovers the
    first K covering Gaussians already in depth order.

    With `two_level_binning`, a coarse pass first selects per-cell candidate
    lists (cells of bin_cell_tiles^2 tiles), and the per-tile pass only scans
    its cell's candidates — the TPU equivalent of CUDA's duplicate+radix-sort
    tile binning without device-side dynamic allocation.
    """
    # Binning is pure integer selection — no gradients flow through it.
    prep = jax.lax.stop_gradient(prep)
    n = prep["depth"].shape[0]
    k = settings.tile_capacity
    # Front-to-back selection key: top_k sorts by score, so -depth yields
    # depth-ordered lists without any global argsort.
    key = jnp.where(prep["visible"], -prep["depth"], -jnp.inf)

    rect_min, rect_max = prep["rect_min"], prep["rect_max"]
    visible = prep["visible"]

    def tile_coords(pad_to: int):
        tiles = jnp.arange(pad_to, dtype=jnp.int32)
        return ((tiles % settings.tiles_x).astype(jnp.float32),
                (tiles // settings.tiles_x).astype(jnp.float32))

    if not settings.two_level_binning:
        chunk = settings.bin_tile_chunk
        num_chunks = -(-settings.num_tiles // chunk)
        pad_tiles = num_chunks * chunk
        tx, ty = tile_coords(pad_tiles)

        def tile_chunk(ci):
            cx = jax.lax.dynamic_slice(tx, (ci * chunk,), (chunk,))
            cy = jax.lax.dynamic_slice(ty, (ci * chunk,), (chunk,))
            covers = (
                (rect_min[None, :, 0] <= cx[:, None])
                & (cx[:, None] < rect_max[None, :, 0])
                & (rect_min[None, :, 1] <= cy[:, None])
                & (cy[:, None] < rect_max[None, :, 1])
                & visible[None, :]
            )  # [chunk, N]
            score = jnp.where(covers, key[None, :], -jnp.inf)
            top_scores, top_idx = _topk_padded(score, k)
            return top_idx, top_scores > -jnp.inf

        idx, valid = jax.lax.map(tile_chunk, jnp.arange(num_chunks))
        entries = idx.reshape(pad_tiles, k)[: settings.num_tiles]
        valid = valid.reshape(pad_tiles, k)[: settings.num_tiles]
        return entries, valid

    # ---- level 1: coarse cells (ids + packed rects, no extra gather) ----
    cell_entries, cell_valid, cell_rect = bin_cells(settings, prep, key)
    cell = settings.bin_cell_tiles
    kc = settings.cell_capacity
    n_cells = settings.cells_x * settings.cells_y

    # ---- level 2: per-tile selection, grouped by cell ----
    # All tiles of a cell share its candidate rows, so the per-tile stage
    # needs NO per-tile gathers: broadcast rect tests + stable compactions.
    # Cell lists are depth-ordered, so selection is a stable compaction of
    # the covers mask: a variadic stable sort on (not-covered, payload...)
    # compacts covered entries to the front in depth order AND carries the
    # payloads along — no element gather afterwards (XLA element gathers
    # inside the map cost ~20ms/frame at Neu3D scale). Like bin_cells, the
    # rect test factors per axis: first compact each tile ROW of the cell
    # (y test, carrying id + rect), then each tile from its row list
    # (x test, carrying id) — O(cell*(kc + cell*krow)) masked elements
    # instead of O(cell^2 * kc).
    krow = min(settings.tile_row_capacity, kc)

    def one_cell(ci):
        cand = cell_entries[ci]           # [kc]
        rp = cell_rect[ci]
        cvalid = cell_valid[ci]
        cx0 = (ci % settings.cells_x) * cell
        cy0 = (ci // settings.cells_x) * cell
        # stage A: tile rows of the cell (y-axis test)
        tys = (cy0 + jnp.arange(cell, dtype=jnp.int32))[:, None]  # [cell,1]
        rminy = ((rp >> 8) & 0xFF)[None, :]
        rmaxy = ((rp >> 24) & 0xFF)[None, :]
        cov_y = (rminy <= tys) & (tys < rmaxy) & cvalid[None, :]  # [cell,kc]
        sky = jnp.where(cov_y, jnp.int32(0), jnp.int32(1))
        skys, cands_y, rps_y = jax.lax.sort(
            (sky, jnp.broadcast_to(cand[None, :], cov_y.shape),
             jnp.broadcast_to(rp[None, :], cov_y.shape)),
            dimension=-1, is_stable=True, num_keys=1)
        cands_y, rps_y = cands_y[:, :krow], rps_y[:, :krow]
        vy = skys[:, :krow] == 0                                  # [cell,krow]
        # stage B: tiles within each row (x-axis test)
        txs = (cx0 + jnp.arange(cell, dtype=jnp.int32))[None, :, None]
        rminx = (rps_y & 0xFF)[:, None, :]                # [cell,1,krow]
        rmaxx = ((rps_y >> 16) & 0xFF)[:, None, :]
        cov = (rminx <= txs) & (txs < rmaxx) & vy[:, None, :]
        skx = jnp.where(cov, jnp.int32(0), jnp.int32(1))
        skxs, ents_sorted = jax.lax.sort(
            (skx, jnp.broadcast_to(cands_y[:, None, :], cov.shape)),
            dimension=-1, is_stable=True, num_keys=1)
        ents2 = ents_sorted.reshape(cell * cell, krow)
        v2 = (skxs == 0).reshape(cell * cell, krow)
        if k > krow:  # tile capacity exceeds the row list: pad with invalid
            pad = [(0, 0), (0, k - krow)]
            return jnp.pad(ents2, pad), jnp.pad(v2, pad,
                                                constant_values=False)
        return ents2[:, :k], v2[:, :k]

    ents, valids = jax.lax.map(one_cell, jnp.arange(n_cells))
    # [n_cells, cell^2, K] -> padded tile grid -> [T, K]
    def to_tiles(a):
        a = a.reshape(settings.cells_y, settings.cells_x, cell, cell, k)
        a = a.transpose(0, 2, 1, 3, 4).reshape(
            settings.cells_y * cell, settings.cells_x * cell, k)
        a = a[: settings.tiles_y, : settings.tiles_x]
        return a.reshape(settings.num_tiles, k)

    return to_tiles(ents), to_tiles(valids)


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
    hp = jax.lax.Precision.HIGHEST

    point_image = prep["point_image"]
    conic = prep["conic"]
    opacity = prep["opacity"]
    depth = prep["depth"]
    colors = prep["colors"]

    feat_all = jnp.concatenate(
        [colors, features, depth[:, None]], axis=1)   # [N, 3+C+1]
    c_all = feat_all.shape[1]

    # One packed per-Gaussian attribute table -> a single flat gather per
    # chunk (multiple narrow gathers are what killed throughput).
    packed = jnp.concatenate(
        [point_image, conic, jnp.log(jnp.maximum(opacity, 1e-30))[:, None],
         feat_all], axis=1)                            # [N, 6 + c_all]
    pk_w = packed.shape[1]

    # Shared tile-local quadratic basis: power(xl, yl) is evaluated as a
    # per-Gaussian 6-vector against [1, xl, yl, xl^2, yl^2, xl*yl] — an MXU
    # matmul replacing the broadcast-heavy dx/dy elementwise formulation.
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), ts)            # [px]
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)          # [px]
    basis = jnp.stack([jnp.ones_like(lx), lx, ly, lx * lx, ly * ly,
                       lx * ly], axis=0)                            # [6, px]

    # Pad tiles to a chunk multiple; padded tiles read list slot entries that
    # are marked invalid, so they composite to background only.
    n_chunks_t = -(-num_t // tc)
    pad_t = n_chunks_t * tc
    tiles = jnp.arange(pad_t, dtype=jnp.int32)
    tile_ox = ((tiles % settings.tiles_x) * ts).astype(jnp.float32)
    tile_oy = ((tiles // settings.tiles_x) * ts).astype(jnp.float32)
    tile_o = jnp.stack([tile_ox, tile_oy], 1).reshape(n_chunks_t, tc, 2)

    num_chunks_g = k // g
    entries_p = jnp.pad(entries, ((0, pad_t - num_t), (0, 0)))
    valid_p = jnp.pad(valid, ((0, pad_t - num_t), (0, 0)))
    entries_c = entries_p.reshape(n_chunks_t, tc, num_chunks_g, g)
    valid_c = valid_p.reshape(n_chunks_t, tc, num_chunks_g, g)

    @jax.checkpoint
    def one_tile_chunk(args):
        ent, vldall, to = args  # [tc,Cg,g],[tc,Cg,g],[tc,2]

        def scan_step(carry, ci):
            T_carry, accum = carry   # [tc,px], [tc,c_all+1,px]
            idx = jax.lax.dynamic_index_in_dim(ent, ci, axis=1, keepdims=False)
            vld = jax.lax.dynamic_index_in_dim(vldall, ci, axis=1,
                                               keepdims=False)
            rows = packed[idx.reshape(-1)].reshape(tc, g, pk_w)
            # tile-local Gaussian center
            mx = rows[..., 0] - to[:, None, 0]
            my = rows[..., 1] - to[:, None, 1]
            c0, c1, c2 = rows[..., 2], rows[..., 3], rows[..., 4]
            ln_op = rows[..., 5]
            ft = rows[..., 6:]                              # [tc,g,c_all]

            # quadratic coefficients of power over local pixel coords
            coef = jnp.stack([
                -0.5 * (c0 * mx * mx + c2 * my * my) - c1 * mx * my,  # 1
                c0 * mx + c1 * my,                                    # x
                c2 * my + c1 * mx,                                    # y
                -0.5 * c0,                                            # x^2
                -0.5 * c2,                                            # y^2
                -c1,                                                  # xy
            ], axis=-1)                                     # [tc,g,6]
            power = jnp.einsum("tgk,kp->tgp", coef, basis,
                               precision=hp)                # [tc,g,px]
            alpha = jnp.exp(power + ln_op[..., None])
            alpha = jnp.minimum(MAX_ALPHA, alpha)
            kill = (power > 0.0) | (~vld[..., None])
            if settings.hard_cutoffs:
                kill = kill | (alpha < ALPHA_MIN)
            alpha = jnp.where(kill, 0.0, alpha)

            cum = jnp.cumprod(1.0 - alpha, axis=1)          # raw T after i
            t_after = T_carry[:, None, :] * cum
            if settings.hard_cutoffs:
                # CUDA early-out: a Gaussian is composited only while the
                # post-blend transmittance stays >= T_EPS. Once a slot is
                # excluded every later slot is too (cum is non-increasing),
                # so raw-cumprod weights are exact for included slots.
                include = t_after >= T_EPS
                t_before = jnp.concatenate(
                    [T_carry[:, None, :], t_after[:, :-1]], axis=1)
                weights = jnp.where(include, alpha * t_before, 0.0)
                # carried T = T after the last *included* slot
                t_masked = jnp.where(include, t_after, jnp.inf)
                T_new = jnp.min(t_masked, axis=1)
                T_new = jnp.where(jnp.isinf(T_new), T_carry, T_new)
            else:
                t_before = jnp.concatenate(
                    [T_carry[:, None, :], t_after[:, :-1]], axis=1)
                weights = alpha * t_before
                T_new = t_after[:, -1, :]

            contrib = jnp.einsum("tgc,tgp->tcp", ft, weights, precision=hp)
            alpha_sum = jnp.sum(weights, axis=1)[:, None, :]  # [tc,1,px]
            accum = accum + jnp.concatenate([contrib, alpha_sum], axis=1)
            return (T_new, accum), None

        T0 = jnp.ones((tc, px), jnp.float32)
        acc0 = jnp.zeros((tc, c_all + 1, px), jnp.float32)
        (T_fin, accum), _ = jax.lax.scan(scan_step, (T0, acc0),
                                         jnp.arange(num_chunks_g))
        # Background blend for RGB only (CUDA adds T*bg to color channels).
        accum = accum.at[:, :3, :].add(T_fin[:, None, :] * bg[None, :, None])
        return accum, T_fin

    accum, T_final = jax.lax.map(one_tile_chunk,
                                 (entries_c, valid_c, tile_o))
    accum = accum.reshape(pad_t, c_all + 1, px)[:num_t]
    T_final = T_final.reshape(pad_t, px)[:num_t]

    # [T, C, px] -> [C, H, W]
    c_out = c_all + 1
    img = accum.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    img = img[:, : settings.image_height, : settings.image_width]
    return img, T_final


def _composite_pallas(settings: RasterSettings, prep, entries, valid,
                      features, bg):
    """Forward-only fused composite (langsplat4d/ops/tile_composite.py),
    assembled into the [C, H, W] image like composite_tiles."""
    from langsplat4d.ops.tile_composite import (composite_tiles_pallas,
                                                pack_rows)
    ts = settings.tile_size
    tb = settings.pallas_tile_block
    rows, c_feat = pack_rows(prep, entries, valid, features)
    counts = valid.sum(axis=1, dtype=jnp.int32)
    pad = (-settings.num_tiles) % tb
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, pad))
    out = composite_tiles_pallas(
        rows, bg, tiles_x=settings.tiles_x, tile_size=ts, tb=tb,
        g=min(settings.composite_chunk, settings.tile_capacity),
        hard_cutoffs=settings.hard_cutoffs, counts=counts)
    c_out = c_feat + 1
    out = out[: settings.num_tiles]
    img = out.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    return img[:, : settings.image_height, : settings.image_width]


def _composite_analytic(settings, prep, entries, valid, features, bg):
    """Training composite with the hand-derived backward
    (langsplat4d/render/composite_vjp.py)."""
    from langsplat4d.render.composite_vjp import composite_cv
    ts = settings.tile_size
    packed = jnp.concatenate(
        [prep["point_image"], prep["conic"], prep["opacity"][:, None],
         prep["colors"], features, prep["depth"][:, None]], axis=1)
    accum = composite_cv(settings, packed, entries, valid, bg)
    c_out = accum.shape[1]
    img = accum.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    return img[:, : settings.image_height, : settings.image_width]


def _composite_cells(settings: RasterSettings, prep, features, bg):
    """Cell-list Pallas compositing: coarse binning only, then each tile walks
    its cell's candidate rows inside the kernel (rect cull fused)."""
    from langsplat4d.ops.tile_composite import (composite_cells_pallas,
                                                pack_cell_rows)
    ts = settings.tile_size
    cell = settings.bin_cell_tiles
    cell_entries, cell_valid, _ = bin_cells(settings, prep)
    rows, c_feat = pack_cell_rows(prep, cell_entries, cell_valid, features)
    # lane-dim slices must be 128-aligned on TPU
    g = min(settings.cell_capacity, max(128, settings.composite_chunk))
    g = (g // 128) * 128
    out = composite_cells_pallas(
        rows, bg, cells_x=settings.cells_x, cell=cell, tile_size=ts,
        g=g, hard_cutoffs=settings.hard_cutoffs)
    # [n_cells, cell^2, c_out, px] -> [C, H, W]
    c_out = c_feat + 1
    img = out.reshape(settings.cells_y, settings.cells_x, cell, cell, c_out,
                      ts, ts)
    img = img.transpose(4, 0, 2, 5, 1, 3, 6).reshape(
        c_out, settings.cells_y * cell * ts, settings.cells_x * cell * ts)
    return img[:, : settings.image_height, : settings.image_width]


def _composite_stream_train(settings: RasterSettings, prep, features, bg):
    """Differentiable stream-binned composite for training
    (render/stream_vjp.py): narrow-sort chunk-aligned build (stop-grad) +
    ONE differentiable gather + fused analytic fwd/bwd pallas pair."""
    from langsplat4d.render.stream import build_stream_train
    from langsplat4d.render.stream_vjp import composite_stream_train
    ts = settings.tile_size
    info = build_stream_train(
        settings, prep, tiers=settings.stream_tiers,
        budget=settings.stream_budget, chunk=settings.stream_train_chunk,
        ellipse_cull=settings.stream_ellipse_cull)
    packed = jnp.concatenate(
        [prep["point_image"], prep["conic"], prep["opacity"][:, None],
         prep["colors"], features, prep["depth"][:, None]], axis=1)
    accum = composite_stream_train(settings, packed, info["src"],
                                   info["valid"], info["chunk_tile"], bg)
    c_out = accum.shape[1]
    img = accum.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    return img[:, : settings.image_height, : settings.image_width]


def _composite_stream(settings: RasterSettings, prep, features, bg):
    """Stream-binned Pallas compositing (render/stream.py + the
    ragged-segment kernel): no per-tile lists, no pack gather."""
    from langsplat4d.ops.tile_composite import composite_stream_pallas
    from langsplat4d.render.stream import build_stream, build_stream_narrow
    ts = settings.tile_size
    if settings.stream_narrow_sort and settings.stream_budget > 0:
        rows, starts, _ = build_stream_narrow(
            settings, prep, features, tiers=settings.stream_tiers,
            budget=settings.stream_budget,
            ellipse_cull=settings.stream_ellipse_cull)
    else:
        rows, starts, _ = build_stream(settings, prep, features,
                                       tiers=settings.stream_tiers)
    out = composite_stream_pallas(
        rows, starts, bg, tiles_x=settings.tiles_x,
        num_tiles=settings.num_tiles, tile_size=ts,
        tb=settings.pallas_tile_block,
        g=settings.composite_chunk,
        hard_cutoffs=settings.hard_cutoffs)
    c_out = out.shape[1]
    out = out[: settings.num_tiles]
    img = out.reshape(settings.tiles_y, settings.tiles_x, c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c_out, settings.tiles_y * ts, settings.tiles_x * ts)
    return img[:, : settings.image_height, : settings.image_width]


def binning_saturation(settings: RasterSettings,
                       prep: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Truncation diagnostics for the capacity-bounded binning levels (for
    report iterations — not the hot path).

    Returns:
    - band_max_count: exact peak y-band occupancy (compare against
      settings.band_capacity; above it, the farthest Gaussians of that band
      are dropped);
    - cell_full_frac / tile_full_frac: fraction of cell / per-tile lists
      that are full — the only case in which that list's capacity may have
      dropped entries (lists below capacity are exact).
    """
    prep = jax.lax.stop_gradient(prep)
    cell = settings.bin_cell_tiles
    rect_min, rect_max = prep["rect_min"], prep["rect_max"]
    band_y0 = jnp.arange(settings.cells_y, dtype=rect_min.dtype) * cell
    in_band = ((rect_min[None, :, 1] < band_y0[:, None] + cell)
               & (rect_max[None, :, 1] > band_y0[:, None])
               & prep["visible"][None, :])
    _, cell_valid, _ = bin_cells(settings, prep)
    _, tile_valid = bin_tiles(settings, prep)
    return {
        "band_max_count": in_band.sum(axis=1).max(),
        "cell_full_frac": cell_valid[:, -1].astype(jnp.float32).mean(),
        "tile_full_frac": tile_valid[:, -1].astype(jnp.float32).mean(),
    }


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
    feats = language_features if settings.include_feature else (
        jnp.zeros((means3d.shape[0], 0), means3d.dtype))
    if settings.stream_train:
        img = _composite_stream_train(settings, prep, feats, bg)
    elif settings.stream_binning:
        img = _composite_stream(settings, prep, feats, bg)
    elif settings.pallas_cell_composite:
        img = _composite_cells(settings, prep, feats, bg)
    else:
        entries, valid = bin_tiles(settings, prep)
        if settings.pallas_composite:
            img = _composite_pallas(settings, prep, entries, valid, feats, bg)
        elif settings.analytic_vjp:
            img = _composite_analytic(settings, prep, entries, valid, feats,
                                      bg)
        else:
            img, _ = composite_tiles(settings, prep, entries, valid, feats,
                                     bg)
    c_lang = feats.shape[1]
    rendered = img[:3]
    lang_img = img[3:3 + c_lang]
    depth_img = img[3 + c_lang:4 + c_lang]
    return rendered, lang_img, prep["radii"], depth_img
