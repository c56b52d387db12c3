"""Stage-aware render pipeline — parity with the reference `render()`
(gaussian_renderer/__init__.py:19-248), composed from GaussianState +
deformation field + the TPU rasterizer.

Stage semantics (reference :40-43,113-128,240-241):
- 'coarse-*': attributes pass through untouched (no deformation).
- 'fine-*':  full deformation call; in 'fine-base' the language MLP is forced
  off (no_dlang=1, :121-124).
- '*-base':  include_feature=False — a zeros placeholder language tensor of
  width lang_dim is still threaded through (:99) and the language image is
  dropped from the output (:240-241).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from langsplat4d.core.state import GaussianState
from langsplat4d.core.transforms import safe_normalize
from langsplat4d.field.deformation import DeformConfig, deform_forward
from langsplat4d.render.raster import CameraParams, RasterSettings, rasterize

STAGES = ("coarse-base", "coarse-lang", "fine-base", "fine-lang",
          "fine-lang-discrete")


def prepare_attributes(
    dcfg: DeformConfig,
    stage: str,
    time: jnp.ndarray,
    gs: GaussianState,
    deform_params: Dict[str, Any],
    aabb: jnp.ndarray,
    *,
    nonormalized: bool = False,
    grid_spatial=None,
    scaling_modifier: float = 1.0,
):
    """Stage-aware deformation + activations, shared by the single-chip
    render below and the tile-band multi-chip render
    (parallel/render.render_frame_banded). Per-Gaussian in, per-Gaussian
    out — under jit with gauss-sharded inputs XLA keeps the whole stage
    shard-local. Returns (means3d, scales_act, rotations_act, opacity_act,
    shs, lang, coff)."""
    include_feature = "base" not in stage
    n = gs.capacity
    means3d = gs.xyz
    opacity = gs.opacity
    scales = gs.scaling
    rotations = gs.rotation
    shs = gs.get_features()

    if include_feature:
        lang = gs.language_feature
        if not nonormalized:
            lang = safe_normalize(lang)
    else:
        lang = jnp.zeros((n, dcfg.lang_dim), opacity.dtype)

    coff = None
    if stage.startswith("coarse"):
        pass  # passthrough (reference :113-114)
    else:
        # fine-*: force no_dlang in base stage (reference :121-124). In
        # 'fine-base' the discrete path must also stay off.
        if "base" in stage:
            stage_dcfg = dataclasses.replace(dcfg, no_dlang=True,
                                             use_discrete_lang_f=False)
        elif "discrete" in stage:
            stage_dcfg = dataclasses.replace(dcfg, use_discrete_lang_f=True)
        else:
            stage_dcfg = dataclasses.replace(dcfg, use_discrete_lang_f=False)
        times = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (n, 1))
        # grid_spatial: optional cached time-independent plane products
        # (field.deformation.make_grid_spatial_cache) — valid only while the
        # Gaussian positions are fixed, i.e. trajectory rendering.
        (means3d, scales, rotations, opacity, shs, lang, coff) = deform_forward(
            deform_params, stage_dcfg, aabb, means3d, scales, rotations,
            opacity, shs, lang, times, grid_spatial=grid_spatial)

    scales_act = jnp.exp(scales)
    if scaling_modifier != 1.0:
        scales_act = scales_act * scaling_modifier
    rotations_act = safe_normalize(rotations)
    opacity_act = jax.nn.sigmoid(opacity)
    return means3d, scales_act, rotations_act, opacity_act, shs, lang, coff


def render(
    settings: RasterSettings,
    dcfg: DeformConfig,
    stage: str,
    cam: CameraParams,
    time: jnp.ndarray,              # [] scalar in [0,1]
    gs: GaussianState,
    deform_params: Dict[str, Any],
    aabb: jnp.ndarray,              # [2,3]
    bg: jnp.ndarray,                # [3]
    means2d_dummy: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    nonormalized: bool = False,
    grid_spatial=None,
) -> Dict[str, jnp.ndarray]:
    """One differentiable render. `settings`, `dcfg`, `stage` must be static.

    Returns the reference's render dict: render, language_feature_image,
    viewspace_points(grad tap), visibility_filter, radii, depth, coff.
    """
    assert stage in STAGES, stage
    include_feature = "base" not in stage
    n = gs.capacity
    if means2d_dummy is None:
        means2d_dummy = jnp.zeros((n, 2), jnp.float32)

    (means3d, scales_act, rotations_act, opacity_act, shs, lang,
     coff) = prepare_attributes(
        dcfg, stage, time, gs, deform_params, aabb,
        nonormalized=nonormalized, grid_spatial=grid_spatial,
        scaling_modifier=scaling_modifier)

    active = gs.active_mask()
    rendered, lang_img, radii, depth = rasterize(
        settings, cam, means3d, means2d_dummy, opacity_act, scales_act,
        rotations_act, shs if override_color is None else None,
        override_color, lang, bg, active=active)

    out = {
        "render": rendered,
        "language_feature_image": lang_img if include_feature else None,
        "viewspace_points": means2d_dummy,
        "visibility_filter": radii > 0,
        "radii": radii,
        "depth": depth,
        "coff": coff,
    }
    return out


@functools.partial(jax.jit, static_argnums=(0,))
def _binning_probe(settings, cam, xyz, opacity, scaling, rotation, shs,
                   active):
    from langsplat4d.render.raster import binning_saturation, preprocess
    prep = preprocess(settings, cam, xyz, jnp.zeros_like(xyz[:, :2]),
                      jax.nn.sigmoid(opacity), jnp.exp(scaling),
                      safe_normalize(rotation), shs, None, active=active)
    return binning_saturation(settings, prep)


def binning_report(settings: RasterSettings, cam: CameraParams,
                   gs: GaussianState) -> Dict[str, float]:
    """Binning-saturation probe on the undeformed Gaussians (deformation
    displacements are small relative to the cell granularity). See
    raster.binning_saturation for field meanings."""
    stats = _binning_probe(settings, cam, gs.xyz, gs.opacity, gs.scaling,
                           gs.rotation, gs.get_features(), gs.active_mask())
    return {k: float(v) for k, v in stats.items()}


def make_raster_settings(height: int, width: int, *, sh_degree: int,
                         lang_dim: int, include_feature: bool,
                         runtime=None) -> RasterSettings:
    kw: Dict[str, Any] = {}
    if runtime is not None:
        kw = dict(tile_size=runtime.tile_size,
                  tile_capacity=runtime.tile_capacity)
    return RasterSettings(
        image_height=height, image_width=width, sh_degree=sh_degree,
        lang_dim=lang_dim, include_feature=include_feature, **kw)
