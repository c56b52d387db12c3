"""TPU-native checkpointing: async, sharded TrainState save/restore (orbax).

The reference checkpoints by gathering everything to host RAM and
`torch.save`-ing a tuple (scene/gaussian_model.py:71-109, train.py:372) — a
full device->host sync on the training thread. This module is the
production-scale alternative for mesh-sharded runs: orbax writes each
array's shards directly (no host gather of the full state) and the save is
ASYNC — training resumes while the write completes in the background.
Restore places every leaf back onto its recorded sharding (or a caller-
supplied mesh), so a resumed multi-chip run starts sharded instead of
replicated.

The torch-interoperable formats (PLY + deformation.pth + full-state pickle,
train/loop.py save_scene/save_checkpoint) remain the default and the
parity surface; this is opt-in via `runtime.orbax_ckpt`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from langsplat4d.train.trainstate import TrainState

_CKPTR = None


def _checkpointer():
    """One async checkpointer per process (owns a background thread pool)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _CKPTR


def save_async(path: str, state: TrainState) -> None:
    """Start an async sharded save of the full TrainState to `path`.

    Returns immediately after the device arrays are snapshotted; the write
    itself proceeds on background threads (call `wait_until_finished` or
    rely on the next save's implicit barrier). Static (non-leaf) fields ride
    a sidecar json so `restore_auto` needs no template."""
    import json

    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    _checkpointer().save(path, args=ocp.args.StandardSave(state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump({"active_sh_degree": state.active_sh_degree}, f)


def wait_until_finished() -> None:
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore(path: str, template: TrainState,
            mesh: Optional[object] = None) -> TrainState:
    """Restore a TrainState saved by `save_async`.

    `template` supplies the tree structure, shapes/dtypes, and static fields
    (active_sh_degree rides the treedef, not the leaves). When `mesh` is
    given the per-Gaussian rows restore directly onto the standard mesh
    shardings (parallel/mesh.shard_state layout) without a replicated
    detour; otherwise each leaf restores onto the template leaf's sharding.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if mesh is not None:
        from langsplat4d.parallel.mesh import shard_state
        template = shard_state(template, mesh)

    def abstract(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    abstract_state = jax.tree.map(abstract, template)
    return _checkpointer().restore(
        path, args=ocp.args.StandardRestore(abstract_state))


def is_orbax_checkpoint(path: str) -> bool:
    """Orbax checkpoints are directories (the pickle format is a file)."""
    return os.path.isdir(path)


def restore_auto(path: str) -> TrainState:
    """Restore without a template (resume path): the raw tree comes back as
    nested dicts in the saved structure; statics load from the sidecar."""
    import json

    import jax.numpy as jnp

    from langsplat4d.train.optim import AdamState

    path = os.path.abspath(path)
    raw = _checkpointer().restore(path)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return TrainState(
        params=jax.tree.map(jnp.asarray, raw["params"]),
        opt=AdamState(m=jax.tree.map(jnp.asarray, raw["opt"]["m"]),
                      v=jax.tree.map(jnp.asarray, raw["opt"]["v"]),
                      step=jnp.asarray(raw["opt"]["step"])),
        num_active=jnp.asarray(raw["num_active"]),
        max_radii2d=jnp.asarray(raw["max_radii2d"]),
        xyz_gradient_accum=jnp.asarray(raw["xyz_gradient_accum"]),
        denom=jnp.asarray(raw["denom"]),
        deformation_table=jnp.asarray(raw["deformation_table"]),
        deformation_accum=jnp.asarray(raw["deformation_accum"]),
        aabb=jnp.asarray(raw["aabb"]),
        active_sh_degree=int(meta.get("active_sh_degree", 0)),
    )
