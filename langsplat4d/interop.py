"""Checkpoint interop with the reference torch pipeline.

Serializes our deformation params as a torch `state_dict` with the exact key
names/shapes of the reference `deform_network` (scene/deformation.py:195-217),
so `deformation.pth` files are interchangeable in both directions:
- our training outputs load into the CUDA reference renderer, and
- reference-trained checkpoints load into this framework for parity checks.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from langsplat4d.field.deformation import DeformConfig


def _lin_to_torch(sd, prefix: str, layer: Dict[str, np.ndarray]):
    sd[f"{prefix}.weight"] = np.asarray(layer["w"]).T.copy()  # [out,in]
    sd[f"{prefix}.bias"] = np.asarray(layer["b"]).copy()


def _lin_from_torch(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"w": np.asarray(sd[f"{prefix}.weight"]).T.copy(),
            "b": np.asarray(sd[f"{prefix}.bias"]).copy()}


# Sequential Linear positions in the reference modules: heads start with ReLU
# (odd indices), feature_out starts with Linear (even indices).
_HEADS = ("pos_deform", "scales_deform", "rotations_deform", "opacity_deform",
          "shs_deform", "discrete_coff_generator", "static_mlp")


def deform_params_to_torch_state_dict(params: Dict[str, Any],
                                      cfg: DeformConfig | None = None,
                                      ) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["timenet"]):
        _lin_to_torch(sd, f"timenet.{2 * i}", layer)
    for i, layer in enumerate(params["feature_out"]):
        _lin_to_torch(sd, f"deformation_net.feature_out.{2 * i}", layer)
    for name in _HEADS:
        if name not in params:
            continue
        for i, layer in enumerate(params[name]):
            _lin_to_torch(sd, f"deformation_net.{name}.{2 * i + 1}", layer)
    for i, layer in enumerate(params["lang_deform"]):
        _lin_to_torch(sd, f"deformation_net.lang_deform.{2 * i + 1}", layer)
    for s, scale_planes in enumerate(params["grid"]["grids"]):
        for p, plane in enumerate(scale_planes):
            sd[f"deformation_net.grid.grids.{s}.{p}"] = \
                np.asarray(plane)[None].copy()  # [1,C,H,W]
    if "empty_voxel" in params:
        # DenseGrid param (scene/grid.py:24): torch stores [1, C, *world]
        sd["deformation_net.empty_voxel.grid"] = \
            np.asarray(params["empty_voxel"])[None].copy()
    # positional-encoding frequency buffers (deformation.py:212-215)
    if cfg is not None:
        sd["time_poc"] = (2.0 ** np.arange(cfg.timebase_pe)).astype(np.float32)
        sd["pos_poc"] = (2.0 ** np.arange(cfg.posebase_pe)).astype(np.float32)
        sd["rotation_scaling_poc"] = \
            (2.0 ** np.arange(cfg.scale_rotation_pe)).astype(np.float32)
        sd["opacity_poc"] = (2.0 ** np.arange(cfg.opacity_pe)).astype(np.float32)
    return sd


def torch_state_dict_to_deform_params(sd: Dict[str, Any],
                                      template: Dict[str, Any],
                                      ) -> Dict[str, Any]:
    """Populate a params pytree (from init_deform_params) from a torch
    state_dict; keys absent from the state_dict keep template values."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    out: Dict[str, Any] = {}
    out["timenet"] = [
        _lin_from_torch(sd, f"timenet.{2 * i}")
        for i in range(len(template["timenet"]))]
    out["feature_out"] = [
        _lin_from_torch(sd, f"deformation_net.feature_out.{2 * i}")
        for i in range(len(template["feature_out"]))]
    for name in _HEADS:
        if name not in template:
            continue
        key0 = f"deformation_net.{name}.1.weight"
        if key0 in sd:
            out[name] = [
                _lin_from_torch(sd, f"deformation_net.{name}.{2 * i + 1}")
                for i in range(len(template[name]))]
        else:
            out[name] = template[name]
    key0 = "deformation_net.lang_deform.1.weight"
    if key0 in sd:
        out["lang_deform"] = [
            _lin_from_torch(sd, f"deformation_net.lang_deform.{2 * i + 1}")
            for i in range(len(template["lang_deform"]))]
    else:
        out["lang_deform"] = template["lang_deform"]
    grids = []
    for s, scale_planes in enumerate(template["grid"]["grids"]):
        planes = []
        for p in range(len(scale_planes)):
            key = f"deformation_net.grid.grids.{s}.{p}"
            planes.append(np.asarray(sd[key])[0] if key in sd
                          else scale_planes[p])
        grids.append(planes)
    out["grid"] = {"grids": grids}
    if "empty_voxel" in template:
        key = "deformation_net.empty_voxel.grid"
        out["empty_voxel"] = (np.asarray(sd[key])[0] if key in sd
                              else template["empty_voxel"])
    return out


def save_deformation(path: str, deform_params: Dict[str, Any], state=None,
                     cfg: DeformConfig | None = None) -> None:
    """save_deformation parity (gaussian_model.py:366-369): writes
    deformation.pth (+ table/accum) via torch serialization."""
    import torch
    sd = deform_params_to_torch_state_dict(deform_params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
               os.path.join(path, "deformation.pth"))
    if state is not None:
        n = int(state.num_active)
        torch.save(torch.from_numpy(
            np.asarray(state.deformation_table)[:n].copy()),
            os.path.join(path, "deformation_table.pth"))
        torch.save(torch.from_numpy(
            np.asarray(state.deformation_accum)[:n].copy()),
            os.path.join(path, "deformation_accum.pth"))


def load_deformation(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """load_model parity (gaussian_model.py:352-364)."""
    import torch
    import jax.numpy as jnp
    import jax
    sd = torch.load(os.path.join(path, "deformation.pth"),
                    map_location="cpu", weights_only=False)
    params = torch_state_dict_to_deform_params(sd, template)
    return jax.tree.map(jnp.asarray, params)
