"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_train import tiny_state


@pytest.fixture(autouse=True)
def require_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8")


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_state_and_batch_layout():
    from jax.sharding import PartitionSpec as P
    from langsplat4d.parallel.mesh import make_mesh, shard_state
    rng = np.random.default_rng(0)
    state, _ = tiny_state(rng, n=40, cap=64)
    mesh = make_mesh(8, data=4, gauss=2)
    sharded = shard_state(state, mesh)
    # per-gaussian rows sharded over 'gauss'; deform params replicated
    xyz_spec = sharded.params["xyz"].sharding.spec
    assert tuple(xyz_spec) and tuple(xyz_spec)[0] == "gauss"
    w = sharded.params["deform"]["pos_deform"][0]["w"]
    assert w.sharding.spec == P()


def test_sharded_train_step_matches_single_device():
    """The same train step on a (2,2) mesh must produce the same loss and
    updated params as unsharded execution."""
    from langsplat4d.parallel.mesh import make_mesh, shard_batch, shard_state
    from langsplat4d.render.raster import RasterSettings
    from langsplat4d.train.optim import LRConfig
    from langsplat4d.train.step import Batch, StepConfig, train_step
    from tests.test_raster import make_camera

    rng = np.random.default_rng(0)
    state, dcfg = tiny_state(rng, n=32, cap=32)
    H = W = 32
    cam = make_camera(H, W)
    settings = RasterSettings(H, W, sh_degree=0, lang_dim=3,
                              include_feature=False, tile_capacity=32,
                              composite_chunk=16, composite_tile_chunk=4)
    lr = LRConfig(position_lr_init=1.6e-3, position_lr_final=1.6e-5,
                  position_lr_delay_mult=0.01, position_lr_max_steps=100,
                  deformation_lr_init=1.6e-3, deformation_lr_final=1.6e-4,
                  deformation_lr_delay_mult=0.01, grid_lr_init=1.6e-2,
                  grid_lr_final=1.6e-3, feature_lr=0.0025, opacity_lr=0.05,
                  scaling_lr=0.005, rotation_lr=0.001,
                  language_feature_lr=0.0025)
    cfg = StepConfig(settings=settings, dcfg=dcfg, lr_cfg=lr,
                     stage="fine-base", vmap_batch=True)
    b = 2
    gt = jnp.asarray(rng.uniform(size=(b, 3, H, W)).astype(np.float32))
    batch = Batch(cams=jax.tree.map(lambda x: jnp.stack([x] * b), cam),
                  times=jnp.asarray([0.2, 0.7]),
                  gt_images=gt, gt_lang=jnp.zeros((b, 3, H, W)),
                  lang_mask=jnp.ones((b, 1, H, W)))

    ref_state, ref_metrics, *_ = train_step(cfg, state, batch, jnp.zeros(3),
                                            jnp.asarray(1), 0)

    mesh = make_mesh(4, data=2, gauss=2)
    s_state = shard_state(state, mesh)
    s_batch = shard_batch(batch, mesh)
    with mesh:
        out_state, out_metrics, *_ = train_step(
            cfg, s_state, s_batch, jnp.zeros(3), jnp.asarray(1), 0)
    np.testing.assert_allclose(float(out_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_state.params["xyz"]),
                               np.asarray(ref_state.params["xyz"]),
                               rtol=1e-4, atol=1e-6)
