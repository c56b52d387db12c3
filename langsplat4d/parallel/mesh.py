"""Multi-chip scale-out: device mesh + sharding rules.

A NEW capability relative to the reference, which is strictly single-GPU
(SURVEY §2 'Parallelism & distributed communication': no torch.distributed /
NCCL anywhere). TPU-native design:

- mesh axes ("data", "gauss"):
  * "data"  — camera-batch data parallelism (train.py:242-268 batches).
  * "gauss" — Gaussian-axis model parallelism: the per-Gaussian parameter rows,
    their Adam moments, and the deformation/preprocess compute (the N-axis
    MLPs + grid samples) shard over this axis.
- The rasterizer's tile lists need all visible Gaussians: XLA's SPMD
  partitioner inserts the all-gather of the (small) per-Gaussian render
  attributes over ICI, and its transpose (reduce-scatter) in the backward.
  Deformation MLP weights and HexPlanes are replicated (they are tiny);
  their gradients are psum'd across the mesh automatically.

Everything rides `jax.jit` + `NamedSharding` constraints — no hand-written
collectives; per the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from langsplat4d.train.step import Batch
from langsplat4d.train.trainstate import GAUSSIAN_KEYS, TrainState

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              gauss: Optional[int] = None) -> Mesh:
    """Factorize available devices into a (data, gauss) mesh. Defaults: all
    devices on the data axis."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None and gauss is None:
        data, gauss = n, 1
    elif data is None:
        data = n // gauss
    elif gauss is None:
        gauss = n // data
    if data * gauss != n:
        raise ValueError(
            f"mesh shape (data={data}, gauss={gauss}) does not factorize "
            f"n_devices={n}")
    if len(devices) < n:
        raise ValueError(
            f"requested a {data}x{gauss} mesh ({n} devices) but only "
            f"{len(devices)} JAX devices are visible; on CPU set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} before JAX "
            "initializes (see __graft_entry__._apply_platform_env)")
    dev_array = np.asarray(devices[:n]).reshape(data, gauss)
    return Mesh(dev_array, (DATA_AXIS, GAUSS_AXIS))


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh with the standard shardings."""
    row = NamedSharding(mesh, P(GAUSS_AXIS))
    rep = NamedSharding(mesh, P())

    def place_params(tree):
        out = {}
        for k, v in tree.items():
            if k in GAUSSIAN_KEYS:
                out[k] = jax.device_put(v, row)
            else:
                out[k] = jax.tree.map(lambda x: jax.device_put(x, rep), v)
        return out

    return state.replace(
        params=place_params(state.params),
        opt=state.opt.replace(
            m=place_params(state.opt.m),
            v=place_params(state.opt.v),
            step=jax.device_put(state.opt.step, rep)),
        num_active=jax.device_put(state.num_active, rep),
        max_radii2d=jax.device_put(state.max_radii2d, row),
        xyz_gradient_accum=jax.device_put(state.xyz_gradient_accum, row),
        denom=jax.device_put(state.denom, row),
        deformation_table=jax.device_put(state.deformation_table, row),
        deformation_accum=jax.device_put(state.deformation_accum, row),
        aabb=jax.device_put(state.aabb, rep),
    )


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Shard the camera batch over the 'data' axis (batch size must be a
    multiple of the data-axis size)."""
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    # every Batch leaf (cams, times, gt images/lang/mask, compact seg/tables)
    # leads with the camera-batch axis — one spec shards them all
    return jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
