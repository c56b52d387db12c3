"""Trained-model loading: PLY + deformation.pth -> TrainState.

Mirrors Scene(load_iteration=..., load_stage=...) + GaussianModel.load_ply/
load_model (scene/__init__.py:35-40,85-93; scene/gaussian_model.py:352-364,
396-444) including `searchForMaxIteration` stage-prefix matching
(utils/system_utils.py:26-28).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np

from langsplat4d.core import plyio, state as statelib
from langsplat4d.field.deformation import DeformConfig, init_deform_params
from langsplat4d.train.trainstate import make_train_state


def search_for_max_iteration(folder: str, stage: str) -> Optional[int]:
    if not os.path.isdir(folder):
        return None
    best = None
    pat = re.compile(re.escape(stage) + r"_iteration_(\d+)$")
    for name in os.listdir(folder):
        m = pat.match(name)
        if m:
            it = int(m.group(1))
            best = it if best is None else max(best, it)
    return best


def load_trained_model(model_path: str, load_stage: str, iteration: int,
                       dcfg: DeformConfig, *, max_sh_degree: int = 3,
                       aabb=None, capacity: Optional[int] = None,
                       seed: int = 0):
    """Returns (TrainState, loaded_iteration)."""
    pc_dir = os.path.join(model_path, "point_cloud")
    if iteration == -1:
        iteration = search_for_max_iteration(pc_dir, load_stage)
        if iteration is None:
            raise FileNotFoundError(
                f"no '{load_stage}_iteration_*' checkpoints in {pc_dir}")
    ckpt_dir = os.path.join(pc_dir, f"{load_stage}_iteration_{iteration}")

    arrays = plyio.ply_arrays_to_gaussians(
        plyio.read_ply(os.path.join(ckpt_dir, "point_cloud.ply")),
        max_sh_degree=max_sh_degree)
    n = len(arrays["xyz"])
    cap = capacity or statelib.round_capacity(n)
    gs = statelib.from_arrays(
        arrays["xyz"], arrays["features_dc"], arrays["features_rest"],
        arrays["scaling"], arrays["rotation"], arrays["opacity"],
        language_feature=arrays["language_feature"]
        if arrays["language_feature"].shape[1] else None,
        capacity=cap, lang_dim=dcfg.lang_dim)

    template = init_deform_params(jax.random.PRNGKey(seed), dcfg)
    deform_path = os.path.join(ckpt_dir, "deformation.pth")
    if os.path.exists(deform_path):
        from langsplat4d.interop import load_deformation
        deform_params = load_deformation(ckpt_dir, template)
    else:
        deform_params = template

    if aabb is None:
        xyz = arrays["xyz"]
        aabb = np.stack([xyz.max(0), xyz.min(0)])
    state = make_train_state(gs, deform_params, aabb,
                             active_sh_degree=max_sh_degree)
    return state, iteration
