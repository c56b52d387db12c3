"""Gaussian scene state as a fixed-capacity padded pytree.

TPU-native replacement for the mutable `GaussianModel` tensor attributes
(reference `scene/gaussian_model.py:49-69`): XLA requires static shapes, so the
per-Gaussian arrays are allocated at a fixed `capacity` and only the prefix
`[0, num_active)` is live. Densify/prune recompact the prefix without changing
shapes; capacity growth (rare) is the only recompile trigger.

Inactive slots are neutralized by construction: opacity logit is very negative
(sigmoid -> ~0) and scales are tiny, so even if a padded slot leaks into the
rasterizer it contributes nothing.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from langsplat4d.core.transforms import (
    covariance_from_scaling_rotation,
    inverse_sigmoid,
)

# Opacity logit assigned to padded (inactive) slots; sigmoid(-30) ~ 1e-13.
PAD_OPACITY_LOGIT = -30.0
# Log-scale assigned to padded slots; exp(-20) ~ 2e-9 world units.
PAD_LOG_SCALE = -20.0


def round_capacity(n: int, granule: int = 8192) -> int:
    """Round a Gaussian count up to a capacity granule (keeps shapes stable)."""
    return max(granule, ((n + granule - 1) // granule) * granule)


@struct.dataclass
class GaussianState:
    """Learnable per-Gaussian parameters (pre-activation), padded to capacity.

    Mirrors `_xyz, _features_dc, _features_rest, _scaling, _rotation, _opacity,
    _language_feature` of the reference (scene/gaussian_model.py:52-69). The
    language feature is always allocated ([cap, lang_dim]); whether it is
    rendered/trained is decided by the stage, as in the reference.
    """

    xyz: jnp.ndarray            # [cap, 3]
    features_dc: jnp.ndarray    # [cap, 1, 3]
    features_rest: jnp.ndarray  # [cap, (max_sh+1)^2 - 1, 3]
    scaling: jnp.ndarray        # [cap, 3] log-scales
    rotation: jnp.ndarray       # [cap, 4] unnormalized quaternions (w,x,y,z)
    opacity: jnp.ndarray        # [cap, 1] logits
    language_feature: jnp.ndarray  # [cap, L] (L = lang_dim or centers*lang_dim)
    num_active: jnp.ndarray     # [] int32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        return int(round((self.features_rest.shape[1] + 1) ** 0.5)) - 1

    @property
    def lang_dim(self) -> int:
        return self.language_feature.shape[1]

    def active_mask(self) -> jnp.ndarray:
        """[cap] bool; True for live Gaussians."""
        idx = jnp.arange(self.capacity)
        return idx < self.num_active

    # ----- activations (reference scene/gaussian_model.py:31-46) -----

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_features(self) -> jnp.ndarray:
        """[cap, (max_sh+1)^2, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return covariance_from_scaling_rotation(
            self.get_scaling(), scaling_modifier, self.rotation
        )


def make_padding(capacity: int, sh_rest: int, lang_dim: int, dtype=jnp.float32):
    """Neutral parameter values for padded slots."""
    return dict(
        xyz=jnp.zeros((capacity, 3), dtype),
        features_dc=jnp.zeros((capacity, 1, 3), dtype),
        features_rest=jnp.zeros((capacity, sh_rest, 3), dtype),
        scaling=jnp.full((capacity, 3), PAD_LOG_SCALE, dtype),
        rotation=jnp.concatenate(
            [jnp.ones((capacity, 1), dtype), jnp.zeros((capacity, 3), dtype)], axis=1
        ),
        opacity=jnp.full((capacity, 1), PAD_OPACITY_LOGIT, dtype),
        language_feature=jnp.zeros((capacity, lang_dim), dtype),
    )


def from_arrays(
    xyz, features_dc, features_rest, scaling, rotation, opacity,
    language_feature=None, capacity: Optional[int] = None, lang_dim: int = 3,
) -> GaussianState:
    """Build a padded GaussianState from dense (unpadded) arrays."""
    n = int(xyz.shape[0])
    cap = capacity if capacity is not None else round_capacity(n)
    assert cap >= n, f"capacity {cap} < active count {n}"
    if language_feature is None:
        language_feature = jnp.zeros((n, lang_dim), jnp.float32)
    pads = make_padding(cap, features_rest.shape[1], language_feature.shape[1])

    def place(pad, arr):
        return jax.lax.dynamic_update_slice(
            pad, jnp.asarray(arr, pad.dtype), (0,) * pad.ndim
        )

    return GaussianState(
        xyz=place(pads["xyz"], xyz),
        features_dc=place(pads["features_dc"], features_dc),
        features_rest=place(pads["features_rest"], features_rest),
        scaling=place(pads["scaling"], scaling),
        rotation=place(pads["rotation"], rotation),
        opacity=place(pads["opacity"], opacity),
        language_feature=place(pads["language_feature"], language_feature),
        num_active=jnp.asarray(n, jnp.int32),
    )


def create_from_pcd(
    points, colors, *, max_sh_degree: int = 3, lang_dim: int = 3,
    capacity: Optional[int] = None, knn_dist2=None,
) -> GaussianState:
    """Initialize from a colored point cloud.

    Mirrors `GaussianModel.create_from_pcd` (scene/gaussian_model.py:192-219):
    SH DC from RGB2SH(colors), log-scales from mean 3-NN squared distance
    (simple-knn distCUDA2 equivalent; see langsplat4d.ops.knn), identity
    quaternions, opacity logit of sigmoid^-1(0.1).
    """
    from langsplat4d.core.sh import rgb_to_sh
    from langsplat4d.ops.knn import mean_knn_dist2

    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    n = points.shape[0]

    if knn_dist2 is None:
        knn_dist2 = mean_knn_dist2(points)
    dist2 = jnp.maximum(knn_dist2, 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    sh_coeffs = (max_sh_degree + 1) ** 2
    features_dc = rgb_to_sh(colors)[:, None, :]          # [n,1,3]
    features_rest = jnp.zeros((n, sh_coeffs - 1, 3))
    rots = jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1)
    opacities = inverse_sigmoid(0.1 * jnp.ones((n, 1)))

    return from_arrays(
        points, features_dc, features_rest, scales, rots, opacities,
        capacity=capacity, lang_dim=lang_dim,
    )
