#!/usr/bin/env python
"""Client-side AOT compile probe for the TPU render/train programs.

The axon tunnel compiles remotely (PALLAS_AXON_REMOTE_COMPILE=1) and a
pathological compile wedges the shared server for hours — unkillable from
here. This probe compiles the SAME programs locally against a compile-only
v5e topology (libtpu is installed), so a hang is visible, attributable and
killable. Usage:

    JAX_PLATFORMS=cpu python scripts/aot_compile_probe.py render [N]
    JAX_PLATFORMS=cpu python scripts/aot_compile_probe.py train

Prints per-stage wall times; exits nonzero on failure.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _topology_device():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    return topo.devices[0]


def probe_render(n=50_000):
    import jax
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding

    from langsplat4d.config import Config
    from langsplat4d.data.cameras import HostCamera
    from langsplat4d.field.deformation import (DeformConfig,
                                               init_deform_params,
                                               make_grid_spatial_cache)
    from langsplat4d.render.pipeline import render
    from langsplat4d.render.raster import RasterSettings
    from langsplat4d.utils.synth import realistic_gaussians

    H = int(os.getenv("BENCH_H", 1014))
    W = int(os.getenv("BENCH_W", 1352))
    lang_dim = 3
    dev = _topology_device()
    shard = SingleDeviceSharding(dev)

    gs = realistic_gaussians(n, lang_dim=lang_dim, seed=0)
    dcfg = DeformConfig(
        lang_dim=lang_dim, no_dlang=False, kplanes_out_dim=16,
        kplanes_resolution=(64, 64, 64, 150), multires=(1, 2), net_width=128,
        defor_depth=0, no_do=False, no_dshs=False, no_ds=False)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = jnp.asarray([[2.6] * 3, [-2.6] * 3], jnp.float32)

    cfg = Config()
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3, lang_dim=lang_dim,
        include_feature=True, tile_size=cfg.runtime.render_tile_size,
        tile_capacity=cfg.runtime.tile_capacity, stream_binning=True,
        stream_single_key=os.environ.get("LS4D_STREAM_SINGLE_KEY",
                                         "1") != "0")

    Rm = np.eye(3)
    T = np.array([0.0, 0.0, 4.5])
    cam = HostCamera(colmap_id=0, R=Rm, T=T, fovx=1.0, fovy=0.8, image=None,
                     image_name="0", uid=0, time=0.5, width=W, height=H)
    camp = cam.camera_params()
    bg = jnp.zeros((3,), jnp.float32)

    t0 = time.time()
    grid_spatial = jax.jit(make_grid_spatial_cache, static_argnums=(1,))(
        dparams, dcfg, aabb, gs.xyz)
    print(f"grid_spatial (cpu exec): {time.time()-t0:.1f}s", flush=True)

    def body(camp, t):
        out = render(settings, dcfg, "fine-lang", camp, t, gs, dparams,
                     aabb, bg, grid_spatial=grid_spatial)
        return out["language_feature_image"]

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array([dev]), ("d",))
    sh = NamedSharding(mesh, P())

    t0 = time.time()
    traced = jax.jit(
        body, out_shardings=sh).trace(camp, jnp.float32(0.5))
    print(f"trace: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    low = traced.lower()
    print(f"lower(tpu): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    exe = low.compile()
    print(f"AOT TPU compile: {time.time()-t0:.1f}s  OK", flush=True)
    return exe


def probe_train():
    """Compile the packed train step at quality-run scale for v5e."""
    import jax
    import jax.numpy as jnp

    from langsplat4d.config import Config
    from langsplat4d.field.deformation import DeformConfig, init_deform_params
    from langsplat4d.render.raster import RasterSettings
    from langsplat4d.train.optim import LRConfig
    from langsplat4d.train.step import (Batch, StepConfig, train_step)
    from langsplat4d.train.trainstate import make_train_state
    from langsplat4d.utils.synth import realistic_gaussians
    from langsplat4d.render.raster import CameraParams

    hw = 64
    cap = 4096
    lang_dim = 3
    gs = realistic_gaussians(cap, lang_dim=lang_dim, seed=0)
    dcfg = DeformConfig(lang_dim=lang_dim, kplanes_out_dim=8,
                        kplanes_resolution=(32, 32, 32, 8), multires=(1, 2),
                        net_width=64, defor_depth=1)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = np.asarray([[2.6] * 3, [-2.6] * 3], np.float32)
    state = make_train_state(gs, dparams, aabb, active_sh_degree=0)
    settings = RasterSettings(image_height=hw, image_width=hw, sh_degree=0,
                              lang_dim=lang_dim, include_feature=False,
                              tile_size=16, tile_capacity=256)
    cfgS = StepConfig(settings=settings, dcfg=dcfg, lr_cfg=LRConfig(),
                      stage="coarse-base")
    b = 1
    batch = Batch(
        cams=CameraParams(
            viewmatrix=jnp.zeros((b, 4, 4)), projmatrix=jnp.zeros((b, 4, 4)),
            campos=jnp.zeros((b, 3)), tanfovx=jnp.ones((b,)),
            tanfovy=jnp.ones((b,))),
        times=jnp.zeros((b,)), gt_images=jnp.zeros((b, 3, hw, hw)),
        gt_lang=None, lang_mask=None)
    t0 = time.time()
    traced = train_step.trace(cfgS, state, batch, jnp.zeros((3,)),
                              jnp.int32(1), 0)
    print(f"trace: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    low = traced.lower(lowering_platforms=("tpu",))
    print(f"lower(tpu): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    low.compile()
    print(f"AOT TPU compile: {time.time()-t0:.1f}s  OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "render"
    if which == "render":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
        probe_render(n)
    else:
        probe_train()
