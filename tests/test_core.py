import os
"""Unit tests for core math: SH, transforms, state, PLY IO, knn, config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.core import sh as shlib
from langsplat4d.core import transforms as tf
from langsplat4d.core import state as statelib
from langsplat4d.core import plyio
from langsplat4d.ops.knn import mean_knn_dist2
from langsplat4d import config as cfglib


class TestSH:
    def test_deg0_constant(self):
        sh = np.zeros((5, 3, 16), np.float32)
        sh[:, :, 0] = 1.0
        dirs = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = shlib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(out, shlib.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            shlib.sh_to_rgb(shlib.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_matches_reference_formula(self, deg, rng):
        """Golden check against an independent numpy transcription."""
        n = 7
        sh = rng.normal(size=(n, 3, 25)).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ours = np.asarray(shlib.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        # numpy reference (same PlenOctree basis)
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        ref = shlib.C0 * sh[..., 0]
        ref = (ref - shlib.C1 * y * sh[..., 1] + shlib.C1 * z * sh[..., 2]
               - shlib.C1 * x * sh[..., 3])
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            ref = (ref + shlib.C2[0] * xy * sh[..., 4]
                   + shlib.C2[1] * yz * sh[..., 5]
                   + shlib.C2[2] * (2 * zz - xx - yy) * sh[..., 6]
                   + shlib.C2[3] * xz * sh[..., 7]
                   + shlib.C2[4] * (xx - yy) * sh[..., 8])
        if deg < 2:
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestTransforms:
    def test_quat_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        R = tf.quat_to_rotmat(q)
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_quat_rotmat_orthonormal(self, rng):
        q = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
        R = np.asarray(tf.quat_to_rotmat(q))
        for i in range(10):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R[i]) > 0.99

    def test_quat_multiply_vs_rotmat(self, rng):
        q1 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        q2 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
        q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
        q3 = tf.quat_multiply(q1, q2)
        R3 = np.asarray(tf.quat_to_rotmat(q3))
        R12 = np.asarray(tf.quat_to_rotmat(q1)) @ np.asarray(tf.quat_to_rotmat(q2))
        np.testing.assert_allclose(R3, R12, atol=1e-5)

    def test_covariance_psd_and_symmetric_strip(self, rng):
        s = jnp.asarray(np.exp(rng.normal(size=(8, 3))).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        cov6 = np.asarray(tf.covariance_from_scaling_rotation(s, 1.0, q))
        for i in range(8):
            C = np.array([
                [cov6[i, 0], cov6[i, 1], cov6[i, 2]],
                [cov6[i, 1], cov6[i, 3], cov6[i, 4]],
                [cov6[i, 2], cov6[i, 4], cov6[i, 5]],
            ])
            evals = np.linalg.eigvalsh(C)
            assert (evals > -1e-5).all()

    def test_projection_matrix_shape(self):
        P = tf.projection_matrix(0.01, 100.0, 1.0, 0.8)
        assert P.shape == (4, 4)
        assert P[3, 2] == 1.0

    def test_world_to_view_roundtrip(self, rng):
        # random rotation
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q[None]))[0])
        t = rng.normal(size=3)
        W = tf.world_to_view(R, t)
        # camera center maps to origin
        C2W = np.linalg.inv(W)
        cam_center = C2W[:3, 3]
        p = W @ np.append(cam_center, 1.0)
        np.testing.assert_allclose(p[:3], 0, atol=1e-5)

    def test_expon_lr_endpoints(self):
        lr0 = float(tf.expon_lr(0, 1e-2, 1e-4, max_steps=100))
        lr_end = float(tf.expon_lr(100, 1e-2, 1e-4, max_steps=100))
        np.testing.assert_allclose(lr0, 1e-2, rtol=1e-5)
        np.testing.assert_allclose(lr_end, 1e-4, rtol=1e-5)
        assert float(tf.expon_lr(-1, 1e-2, 1e-4)) == 0.0


class TestState:
    def _make(self, n=100, lang_dim=3):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        return statelib.create_from_pcd(
            pts, cols, max_sh_degree=3, lang_dim=lang_dim, capacity=256)

    def test_create_shapes(self):
        gs = self._make()
        assert gs.capacity == 256
        assert int(gs.num_active) == 100
        assert gs.features_rest.shape == (256, 15, 3)
        assert gs.max_sh_degree == 3
        assert gs.lang_dim == 3

    def test_padding_is_neutral(self):
        gs = self._make()
        op = np.asarray(gs.get_opacity())
        assert (op[100:] < 1e-9).all()
        sc = np.asarray(gs.get_scaling())
        assert (sc[100:] < 1e-8).all()

    def test_activations(self):
        gs = self._make()
        rot = np.asarray(gs.get_rotation())
        np.testing.assert_allclose(np.linalg.norm(rot, axis=-1), 1.0, atol=1e-6)
        assert gs.get_features().shape == (256, 16, 3)

    def test_initial_opacity_is_0p1(self):
        gs = self._make()
        op = np.asarray(gs.get_opacity())[:100]
        np.testing.assert_allclose(op, 0.1, atol=1e-6)


class TestPlyIO(object):
    def test_roundtrip(self, tmp_path, rng):
        n = 50
        arrays = dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
            language_feature=rng.normal(size=(n, 3)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        path = str(tmp_path / "point_cloud.ply")
        plyio.write_ply(path, plyio.gaussians_to_ply_arrays(**arrays))
        back = plyio.ply_arrays_to_gaussians(plyio.read_ply(path))
        for key in arrays:
            np.testing.assert_allclose(back[key], arrays[key], rtol=1e-6,
                                       err_msg=key)


class TestKNN:
    def test_matches_bruteforce(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        ours = np.asarray(mean_knn_dist2(pts))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)

    def test_grid_points(self):
        # unit grid: 3 NNs all at distance 1 for interior points
        g = np.stack(np.meshgrid(*[np.arange(5.0)] * 3), -1).reshape(-1, 3)
        out = np.asarray(mean_knn_dist2(g.astype(np.float32)))
        np.testing.assert_allclose(out, 1.0, atol=1e-5)


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = cfglib.Config()
        assert cfg.optim.iterations == 24000
        assert cfg.hidden.kplanes_config["resolution"] == [64, 64, 64, 25]
        assert cfg.model.sh_degree == 3
        assert cfg.optim.position_lr_max_steps == 20000

    def test_py_config_overlay(self, tmp_path):
        base = tmp_path / "default.py"
        base.write_text(
            "ModelHiddenParams = dict(kplanes_config=dict("
            "grid_dimensions=2, input_coordinate_dim=4,"
            "output_coordinate_dim=16, resolution=[64,64,64,150]))\n"
            "OptimizationParams = dict(batch_size=4)\n")
        child = tmp_path / "scene.py"
        child.write_text("_base_ = './default.py'\n"
                         "OptimizationParams = dict(batch_size=2)\n")
        cfg = cfglib.Config()
        cfglib.apply_overrides(cfg, cfglib.load_py_config(str(child)))
        assert cfg.optim.batch_size == 2
        assert cfg.hidden.kplanes_config["output_coordinate_dim"] == 16

    def test_cfg_args_roundtrip(self, tmp_path):
        cfg = cfglib.Config()
        cfg.model.source_path = "/data/x"
        cfg.optim.batch_size = 7
        cfglib.save_cfg_args(cfg, str(tmp_path))
        cfg2 = cfglib.load_cfg_args(str(tmp_path), cfglib.Config())
        assert cfg2.optim.batch_size == 7
        assert cfg2.model.source_path == "/data/x"


class TestScenePresets:
    """The shipped per-scene presets reproduce the reference hyperparameters
    (arguments/{hypernerf,neu3d,dnerf,dycheck,multipleview}/*.py)."""
    ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

    def _load(self, rel):
        cfg = cfglib.Config()
        cfglib.apply_overrides(
            cfg, cfglib.load_py_config(os.path.join(self.ROOT, rel)))
        return cfg

    @pytest.mark.parametrize("scene,treso", [
        ("chicken", 80), ("3dprinter", 100), ("banana", 250),
        ("broom2", 100), ("default", 150)])
    def test_hypernerf(self, scene, treso):
        cfg = self._load(f"hypernerf/{scene}.py")
        assert cfg.hidden.kplanes_config["resolution"] == [64, 64, 64, treso]
        assert cfg.hidden.kplanes_config["output_coordinate_dim"] == 16
        assert cfg.hidden.multires == [1, 2, 4]
        assert cfg.hidden.net_width == 128
        assert cfg.hidden.plane_tv_weight == 0.0002
        assert cfg.optim.opacity_reset_interval == 300000

    @pytest.mark.parametrize("scene,bs", [
        ("coffee_martini", 4), ("flame_salmon", 4), ("cook_spinach", 2),
        ("cut_roasted_beef", 2), ("flame_steak", 2), ("sear_steak", 2)])
    def test_neu3d(self, scene, bs):
        cfg = self._load(f"neu3d/{scene}.py")
        assert cfg.optim.batch_size == bs
        assert cfg.optim.dataloader is True
        assert cfg.hidden.defor_depth == 0
        assert cfg.hidden.multires == [1, 2]
        assert cfg.hidden.no_do is False and cfg.hidden.no_dshs is False
        assert cfg.optim.opacity_threshold_coarse == 0.005

    @pytest.mark.parametrize("scene,treso", [
        ("bouncingballs", 75), ("hellwarrior", 50), ("hook", 50),
        ("jumpingjacks", 100), ("lego", 25), ("mutant", 75),
        ("standup", 75), ("trex", 100)])
    def test_dnerf(self, scene, treso):
        cfg = self._load(f"dnerf/{scene}.py")
        assert cfg.hidden.kplanes_config["resolution"] == [64, 64, 64, treso]
        assert cfg.hidden.kplanes_config["output_coordinate_dim"] == 32
        assert cfg.hidden.net_width == 64
        assert cfg.optim.pruning_interval == 8000
        assert cfg.optim.grid_lr_final == 0.000016

    def test_dycheck_multipleview(self):
        dy = self._load("dycheck/default.py")
        assert dy.hidden.multires == [1, 2, 4] and dy.optim.batch_size == 2
        mv = self._load("multipleview/default.py")
        assert mv.optim.batch_size == 1 and mv.optim.dataloader is True
