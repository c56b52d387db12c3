"""Per-group Adam optimizer with schedule-driven learning rates.

Mirrors the reference's torch.optim.Adam usage (`Adam(l, lr=0.0, eps=1e-15)`,
scene/gaussian_model.py:301) with the param-group structure of
`training_setup` (:220-313) and `update_learning_rate` (:315-329), rebuilt as
a pure pytree transformation so densify/prune state surgery becomes fixed-shape
row permutation (SURVEY §7 hard-part #3).

Param-group labels: xyz, f_dc, f_rest, opacity, scaling, rotation,
language_feature, deformation (deform MLPs + timenet), grid (HexPlanes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from langsplat4d.core.transforms import expon_lr

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15  # reference uses eps=1e-15


def group_of_leaf(path) -> str:
    """Map a pytree path inside the params dict to its param-group label."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if keys and keys[0] == "deform":
        return "grid" if ("grid" in keys) else "deformation"
    return str(keys[0])


def label_tree(params) -> Any:
    """Pytree of group labels, same structure as params."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    labels = [group_of_leaf(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, labels)


@struct.dataclass
class AdamState:
    m: Any
    v: Any
    step: jnp.ndarray  # [] int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.asarray(0, jnp.int32))


def adam_update(params, grads, opt: AdamState, lr_tree, train_tree,
                eps: float = EPS):
    """One Adam step. lr_tree: per-leaf scalar LR; train_tree: per-leaf bool
    (False leaves keep params AND moments untouched, like requires_grad=False).
    """
    step = opt.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t

    def upd(p, g, m, v, lr, trainable):
        if not trainable:
            return p, m, v
        m_new = BETA1 * m + (1 - BETA1) * g
        v_new = BETA2 * v + (1 - BETA2) * g * g
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return p_new, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt.m)
    flat_v = treedef.flatten_up_to(opt.v)
    flat_lr = treedef.flatten_up_to(lr_tree)
    flat_tr = treedef.flatten_up_to(train_tree)
    out = [upd(p, g, m, v, lr, tr) for p, g, m, v, lr, tr in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lr, flat_tr)]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_p, AdamState(m=new_m, v=new_v, step=step)


@dataclass(frozen=True)
class LRConfig:
    """Static LR configuration distilled from OptimizationParams + the
    spatial_lr_scale multiplier (training_setup, gaussian_model.py:302-313)."""
    position_lr_init: float
    position_lr_final: float
    position_lr_delay_mult: float
    position_lr_max_steps: int
    deformation_lr_init: float
    deformation_lr_final: float
    deformation_lr_delay_mult: float
    grid_lr_init: float
    grid_lr_final: float
    feature_lr: float
    opacity_lr: float
    scaling_lr: float
    rotation_lr: float
    language_feature_lr: float
    spatial_lr_scale: float = 1.0

    @classmethod
    def from_optim(cls, o, spatial_lr_scale: float) -> "LRConfig":
        return cls(
            position_lr_init=o.position_lr_init,
            position_lr_final=o.position_lr_final,
            position_lr_delay_mult=o.position_lr_delay_mult,
            position_lr_max_steps=o.position_lr_max_steps,
            deformation_lr_init=o.deformation_lr_init,
            deformation_lr_final=o.deformation_lr_final,
            deformation_lr_delay_mult=o.deformation_lr_delay_mult,
            grid_lr_init=o.grid_lr_init,
            grid_lr_final=o.grid_lr_final,
            feature_lr=o.feature_lr,
            opacity_lr=o.opacity_lr,
            scaling_lr=o.scaling_lr,
            rotation_lr=o.rotation_lr,
            language_feature_lr=o.language_feature_lr,
            spatial_lr_scale=spatial_lr_scale,
        )


def group_lrs(cfg: LRConfig, iteration) -> Dict[str, jnp.ndarray]:
    """Per-group LR at `iteration` (traced ok). Scheduled groups follow
    update_learning_rate (gaussian_model.py:315-329); others are constant."""
    s = cfg.spatial_lr_scale
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return {
        "xyz": expon_lr(iteration, cfg.position_lr_init * s,
                        cfg.position_lr_final * s,
                        lr_delay_mult=cfg.position_lr_delay_mult,
                        max_steps=cfg.position_lr_max_steps),
        "deformation": expon_lr(iteration, cfg.deformation_lr_init * s,
                                cfg.deformation_lr_final * s,
                                lr_delay_mult=cfg.deformation_lr_delay_mult,
                                max_steps=cfg.position_lr_max_steps),
        "grid": expon_lr(iteration, cfg.grid_lr_init * s,
                         cfg.grid_lr_final * s,
                         lr_delay_mult=cfg.deformation_lr_delay_mult,
                         max_steps=cfg.position_lr_max_steps),
        "f_dc": f32(cfg.feature_lr),
        "f_rest": f32(cfg.feature_lr / 20.0),
        "opacity": f32(cfg.opacity_lr),
        "scaling": f32(cfg.scaling_lr),
        "rotation": f32(cfg.rotation_lr),
        "language_feature": f32(cfg.language_feature_lr),
    }


def lr_tree_for(params, labels, lrs: Dict[str, jnp.ndarray]):
    return jax.tree.map(lambda lbl: lrs[lbl], labels)


def trainable_tree(params, stage: str, *, include_feature: bool,
                   joint_train: bool, no_dlang: bool) -> Any:
    """Per-leaf trainability — collapses the reference's param-group selection
    + requires_grad_ toggles (training_setup, gaussian_model.py:226-299).

    Returns a pytree of Python bools matching `params` structure.
    """
    lang_stage = include_feature and ("lang" in stage)

    def decide(path, _leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        top = keys[0]
        if lang_stage:
            if top == "language_feature":
                return True
            if top == "deform":
                if "fine" not in stage:
                    return False  # no deform groups in coarse-lang (:248)
                if "lang_deform" in keys:
                    return not no_dlang  # (:260)
                if "discrete_coff_generator" in keys:
                    return "discrete" in stage  # (:261-262)
                return joint_train
            # gaussian tensors
            return joint_train
        else:
            # base stages: everything trains except language features (:273-299)
            if top == "language_feature":
                return False
            return True

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [decide(path, leaf) for path, leaf in flat])
