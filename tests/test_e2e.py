"""End-to-end smoke: tiny HyperNeRF scene -> 4-stage training -> render CLI.

This is the CPU-runnable equivalent of the reference's only acceptance path
(train -> render -> eval); exercises scene sniffing, the curriculum, language
features, checkpoint save/load, and the FPS-measured render driver.
"""
import glob
import os

import numpy as np
import pytest

from tests.scene_fixture import make_nerfies_scene


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    return make_nerfies_scene(str(root / "nerfies"), n_imgs=8, hw=64,
                              n_points=100)


@pytest.fixture(scope="module")
def tiny_cfg(tiny_scene, tmp_path_factory):
    from langsplat4d.config import Config
    out = tmp_path_factory.mktemp("out")
    cfg = Config()
    cfg.model.source_path = tiny_scene
    cfg.model.model_path = str(out / "model")
    cfg.model.language_features_name = "language_features"
    cfg.model.feature_level = 1
    cfg.optim.coarse_base_iterations = 10
    cfg.optim.coarse_lang_iterations = 5
    cfg.optim.fine_base_iterations = 10
    cfg.optim.fine_lang_iterations = 10
    cfg.optim.densify_from_iter = 3
    cfg.optim.densification_interval = 5
    cfg.optim.pruning_from_iter = 1000  # off
    cfg.optim.opacity_reset_interval = 10000  # off
    cfg.optim.max_points = 200
    cfg.optim.batch_size = 2
    cfg.runtime.capacity_granule = 256
    cfg.runtime.tile_capacity = 256
    cfg.extras.save_iterations = [10]
    cfg.extras.checkpoint_iterations = [10]
    cfg.hidden.kplanes_config = {
        "grid_dimensions": 2, "input_coordinate_dim": 4,
        "output_coordinate_dim": 4, "resolution": [8, 8, 8, 4]}
    cfg.hidden.multires = [1]
    cfg.hidden.net_width = 16
    cfg.hidden.posebase_pe = 2
    cfg.hidden.no_dlang = 0
    return cfg


@pytest.fixture(scope="module")
def trained(tiny_cfg):
    from langsplat4d.train.loop import training
    return training(tiny_cfg)


@pytest.mark.slow
def test_full_training_curriculum(tiny_cfg, trained):
    state = trained
    assert int(state.num_active) >= 100  # clones may have added points
    # saved scene exists for fine stages at iteration 10
    pc = os.path.join(tiny_cfg.model.model_path, "point_cloud")
    assert os.path.isdir(os.path.join(pc, "fine-lang_iteration_10")), \
        os.listdir(pc)
    assert os.path.exists(os.path.join(
        pc, "fine-lang_iteration_10", "point_cloud.ply"))
    assert os.path.exists(os.path.join(
        pc, "fine-lang_iteration_10", "deformation.pth"))
    # full checkpoint written
    assert os.path.exists(os.path.join(
        tiny_cfg.model.model_path, "chkpnt_fine-lang_10.pth"))
    # cfg_args persisted
    assert os.path.exists(os.path.join(tiny_cfg.model.model_path, "cfg_args"))


@pytest.mark.slow
def test_render_driver_after_training(tiny_cfg, trained):
    from langsplat4d.checkpoint import load_trained_model
    from langsplat4d.data.scene import Scene
    from langsplat4d.field.deformation import DeformConfig
    from langsplat4d.render.driver import render_set

    scene = Scene(tiny_cfg.model.source_path,
                  model_path=tiny_cfg.model.model_path)
    dcfg = DeformConfig.from_config(tiny_cfg.hidden, tiny_cfg.runtime,
                                    max_sh_degree=tiny_cfg.model.sh_degree)
    state, it = load_trained_model(
        tiny_cfg.model.model_path, "fine-lang", -1, dcfg,
        max_sh_degree=tiny_cfg.model.sh_degree, aabb=scene.aabb)
    assert it == 10

    views = [scene.getTestCameras()[i]
             for i in range(len(scene.getTestCameras()))]
    fps = render_set(tiny_cfg, state, dcfg, scene, "test", it, views,
                     mode="rgb", load_stage="fine-lang", novideo=True)
    assert fps >= 0
    base = os.path.join(tiny_cfg.model.model_path, "test_rgb", f"ours_{it}")
    assert len(glob.glob(os.path.join(base, "renders", "*.png"))) == len(views)
    assert len(glob.glob(os.path.join(base, "renders_npy", "*.npy"))) \
        == len(views)
    img = np.asarray([np.load(p) for p in
                      sorted(glob.glob(os.path.join(base, "renders_npy",
                                                    "*.npy")))])
    assert np.isfinite(img).all()

    # lang mode renders + raw npy maps for eval
    fps = render_set(tiny_cfg, state, dcfg, scene, "test", it, views,
                     mode="lang", load_stage="fine-lang", novideo=True)
    lang_base = os.path.join(tiny_cfg.model.model_path, "test_lang",
                             f"ours_{it}")
    maps = sorted(glob.glob(os.path.join(lang_base, "renders_npy", "*.npy")))
    assert len(maps) == len(views)
    m = np.load(maps[0])
    assert m.shape[-1] == 3  # lang_dim channels


@pytest.mark.slow
def test_discrete_stage_resume(tiny_cfg, trained):
    """Phase-B resume: restore the fine-lang checkpoint, expand language
    features to per-Gaussian discrete centers, and train fine-lang-discrete
    (reference two-phase schedule, scripts/train_eval.sh:20-33)."""
    import copy
    import jax.numpy as jnp
    from langsplat4d.train.loop import training

    cfg = copy.deepcopy(tiny_cfg)
    cfg.runtime.use_discrete_lang_f = True
    cfg.runtime.centers_num = 3
    cfg.extras.resume_from_final_stage = 1
    cfg.extras.init_from_stage = "fine-base"
    cfg.extras.start_checkpoint = os.path.join(
        cfg.model.model_path, "chkpnt_fine-lang_10.pth")
    cfg.extras.save_iterations = []
    cfg.extras.checkpoint_iterations = []
    cfg.extras.test_iterations = []
    # fine_lang_iterations + 10000 is the stage budget (train.py:441); keep
    # the smoke tiny by zeroing the base count and monkeypatching the +10000.
    cfg.optim.fine_lang_iterations = 5

    import langsplat4d.train.loop as looplib
    orig = looplib.scene_reconstruction

    def shortened(cfg2, scene, state, dcfg, stage, joint, iters, timer,
                  **kw):
        return orig(cfg2, scene, state, dcfg, stage, joint, min(iters, 5),
                    timer, **kw)

    looplib.scene_reconstruction = shortened
    try:
        state = training(cfg)
    finally:
        looplib.scene_reconstruction = orig
    # language features expanded to centers_num * lang_dim columns
    assert state.params["language_feature"].shape[1] == 9
    assert np.isfinite(np.asarray(state.params["language_feature"])).all()


@pytest.mark.slow
def test_gui_bridge_receives_frames(tiny_cfg, trained):
    """A viewer client on the TCP bridge receives a rendered frame during
    training polling (reference train.py:166-191 + network_gui.py:26-85)."""
    import json
    import socket
    import struct
    import jax.numpy as jnp
    from langsplat4d.data.scene import Scene
    from langsplat4d.field.deformation import DeformConfig
    from langsplat4d.render.raster import RasterSettings
    from langsplat4d.train.loop import _gui_poll
    from langsplat4d.train.optim import LRConfig
    from langsplat4d.train.step import StepConfig
    from langsplat4d.utils import network_gui

    scene = Scene(tiny_cfg.model.source_path,
                  model_path=tiny_cfg.model.model_path)
    dcfg = DeformConfig.from_config(tiny_cfg.hidden, tiny_cfg.runtime,
                                    max_sh_degree=tiny_cfg.model.sh_degree)
    settings = RasterSettings(image_height=64, image_width=64, sh_degree=0,
                              lang_dim=3, include_feature=False,
                              tile_capacity=256)
    step_cfg = StepConfig(settings=settings, dcfg=dcfg,
                          lr_cfg=LRConfig.from_optim(tiny_cfg.optim, 1.0),
                          stage="coarse-base")
    bg = jnp.zeros(3)

    w = h = 32
    msg = {
        "resolution_x": w, "resolution_y": h, "train": True,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": np.eye(4, dtype=np.float32).reshape(-1).tolist(),
        "view_projection_matrix":
            np.eye(4, dtype=np.float32).reshape(-1).tolist(),
    }
    payload = json.dumps(msg).encode("utf-8")

    client, server = socket.socketpair()
    old = (network_gui.listener, network_gui.conn)
    network_gui.listener, network_gui.conn = object(), server
    try:
        client.sendall(struct.pack("<I", len(payload)) + payload)
        _gui_poll(tiny_cfg, scene, trained, step_cfg, "coarse-base",
                  iteration=1, final_iter=10, bg=bg, gui_ctx={})
        client.settimeout(5)
        buf = b""
        want = w * h * 3 + 4 + len(tiny_cfg.model.source_path)
        while len(buf) < want:
            chunk = client.recv(65536)
            assert chunk, "connection closed before full frame"
            buf += chunk
        frame = np.frombuffer(buf[: w * h * 3], np.uint8)
        assert frame.shape[0] == w * h * 3
        (slen,) = struct.unpack("<I", buf[w * h * 3: w * h * 3 + 4])
        assert buf[w * h * 3 + 4:].decode("ascii") == \
            tiny_cfg.model.source_path[:slen]
    finally:
        network_gui.listener, network_gui.conn = old
        client.close()
        server.close()
