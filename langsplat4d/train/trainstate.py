"""TrainState: the full trainable bundle + auxiliary densification buffers.

Equivalent of the mutable GaussianModel attributes + optimizer
(scene/gaussian_model.py:49-69,220-313) as one immutable pytree. All
per-Gaussian arrays share the fixed capacity of GaussianState.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

from langsplat4d.core.state import GaussianState
from langsplat4d.train.optim import AdamState, adam_init

GAUSSIAN_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
                 "language_feature")
PARAM_TO_STATE = {
    "xyz": "xyz", "f_dc": "features_dc", "f_rest": "features_rest",
    "opacity": "opacity", "scaling": "scaling", "rotation": "rotation",
    "language_feature": "language_feature",
}


@struct.dataclass
class TrainState:
    params: Dict[str, Any]          # gaussian tensors + {'deform': pytree}
    opt: AdamState
    num_active: jnp.ndarray         # [] int32
    max_radii2d: jnp.ndarray        # [cap]
    xyz_gradient_accum: jnp.ndarray  # [cap, 1]
    denom: jnp.ndarray              # [cap, 1]
    deformation_table: jnp.ndarray  # [cap] bool
    deformation_accum: jnp.ndarray  # [cap, 3]
    aabb: jnp.ndarray               # [2, 3]
    active_sh_degree: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]

    def gaussians(self) -> GaussianState:
        p = self.params
        return GaussianState(
            xyz=p["xyz"], features_dc=p["f_dc"], features_rest=p["f_rest"],
            scaling=p["scaling"], rotation=p["rotation"], opacity=p["opacity"],
            language_feature=p["language_feature"],
            num_active=self.num_active,
        )


def make_train_state(gs: GaussianState, deform_params, aabb,
                     active_sh_degree: int = 0) -> TrainState:
    cap = gs.capacity
    params = {
        "xyz": gs.xyz, "f_dc": gs.features_dc, "f_rest": gs.features_rest,
        "opacity": gs.opacity, "scaling": gs.scaling, "rotation": gs.rotation,
        "language_feature": gs.language_feature, "deform": deform_params,
    }
    return TrainState(
        params=params,
        opt=adam_init(params),
        num_active=gs.num_active,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap, 1), jnp.float32),
        denom=jnp.zeros((cap, 1), jnp.float32),
        deformation_table=jnp.ones((cap,), bool),
        deformation_accum=jnp.zeros((cap, 3), jnp.float32),
        aabb=jnp.asarray(aabb, jnp.float32),
        active_sh_degree=active_sh_degree,
    )


def reset_densification_stats(state: TrainState) -> TrainState:
    cap = state.capacity
    return state.replace(
        xyz_gradient_accum=jnp.zeros((cap, 1), jnp.float32),
        denom=jnp.zeros((cap, 1), jnp.float32),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        deformation_accum=jnp.zeros((cap, 3), jnp.float32),
    )


def one_up_sh_degree(state: TrainState, max_sh_degree: int) -> TrainState:
    """oneupSHdegree (gaussian_model.py:188-190); triggers a retrace."""
    if state.active_sh_degree < max_sh_degree:
        return state.replace(active_sh_degree=state.active_sh_degree + 1)
    return state
