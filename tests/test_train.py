"""Tests for the training layer: Adam parity vs torch, densify/prune surgery,
and an end-to-end tiny-scene optimization smoke test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.core import state as statelib
from langsplat4d.field.deformation import DeformConfig, init_deform_params
from langsplat4d.render.raster import RasterSettings
from langsplat4d.train import densify as D
from langsplat4d.train import losses
from langsplat4d.train.optim import (
    LRConfig, adam_init, adam_update, group_lrs, label_tree, trainable_tree)
from langsplat4d.train.step import Batch, StepConfig, train_step
from langsplat4d.train.trainstate import make_train_state
from tests.test_raster import make_camera


def tiny_dcfg(lang_dim=3):
    return DeformConfig(
        net_width=16, posebase_pe=2, kplanes_out_dim=4,
        kplanes_resolution=(8, 8, 8, 4), multires=(1,), lang_dim=lang_dim)


def tiny_state(rng, n=40, cap=64, lang_dim=3, dcfg=None):
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    gs = statelib.create_from_pcd(pts, cols, max_sh_degree=3,
                                  lang_dim=lang_dim, capacity=cap)
    dcfg = dcfg or tiny_dcfg(lang_dim)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = np.array([[1.6, 1.6, 1.6], [-1.6, -1.6, -1.6]], np.float32)
    return make_train_state(gs, dparams, aabb), dcfg


class TestAdamVsTorch:
    def test_matches_torch_adam(self, rng):
        import torch
        p0 = rng.normal(size=(5, 3)).astype(np.float32)
        gseq = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(5)]
        lr = 0.01

        tp = torch.nn.Parameter(torch.tensor(p0.copy()))
        topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
        for g in gseq:
            tp.grad = torch.tensor(g)
            topt.step()

        params = {"x": jnp.asarray(p0)}
        opt = adam_init(params)
        for g in gseq:
            params, opt = adam_update(
                params, {"x": jnp.asarray(g)}, opt,
                {"x": jnp.asarray(lr)}, {"x": True})
        np.testing.assert_allclose(np.asarray(params["x"]),
                                   tp.detach().numpy(), rtol=1e-5, atol=1e-6)

    def test_frozen_leaves_untouched(self, rng):
        params = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
        opt = adam_init(params)
        grads = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
        new, _ = adam_update(params, grads, opt,
                             {"a": jnp.asarray(0.1), "b": jnp.asarray(0.1)},
                             {"a": True, "b": False})
        assert not np.allclose(np.asarray(new["a"]), 1.0)
        np.testing.assert_array_equal(np.asarray(new["b"]), 1.0)


class TestGroupLabels:
    def test_labels(self, rng):
        state, dcfg = tiny_state(rng)
        labels = label_tree(state.params)
        assert labels["xyz"] == "xyz"
        assert labels["deform"]["grid"]["grids"][0][0] == "grid"
        assert labels["deform"]["pos_deform"][0]["w"] == "deformation"

    def test_trainable_fine_lang_not_joint(self, rng):
        state, dcfg = tiny_state(rng)
        tt = trainable_tree(state.params, "fine-lang", include_feature=True,
                            joint_train=False, no_dlang=False)
        assert tt["language_feature"] is True
        assert tt["xyz"] is False
        assert tt["deform"]["lang_deform"][0]["w"] is True
        assert tt["deform"]["pos_deform"][0]["w"] is False
        assert tt["deform"]["grid"]["grids"][0][0] is False

    def test_trainable_base(self, rng):
        state, dcfg = tiny_state(rng)
        tt = trainable_tree(state.params, "coarse-base", include_feature=True,
                            joint_train=False, no_dlang=True)
        assert tt["language_feature"] is False
        assert tt["xyz"] is True
        assert tt["deform"]["grid"]["grids"][0][0] is True

    def test_lr_schedule_groups(self):
        cfg = LRConfig(
            position_lr_init=1e-3, position_lr_final=1e-5,
            position_lr_delay_mult=0.01, position_lr_max_steps=100,
            deformation_lr_init=1e-3, deformation_lr_final=1e-4,
            deformation_lr_delay_mult=0.01, grid_lr_init=1e-2,
            grid_lr_final=1e-3, feature_lr=0.0025, opacity_lr=0.05,
            scaling_lr=0.005, rotation_lr=0.001, language_feature_lr=0.0025,
            spatial_lr_scale=2.0)
        lrs = group_lrs(cfg, 0)
        np.testing.assert_allclose(float(lrs["xyz"]), 2e-3, rtol=1e-5)
        np.testing.assert_allclose(float(lrs["f_rest"]), 0.0025 / 20)


class TestDensify:
    def test_clone_appends(self, rng):
        state, _ = tiny_state(rng, n=40, cap=64)
        # force high accumulated grads on 5 gaussians
        accum = np.zeros((64, 1), np.float32)
        accum[:5] = 10.0
        denom = np.ones((64, 1), np.float32)
        state = state.replace(xyz_gradient_accum=jnp.asarray(accum),
                              denom=jnp.asarray(denom))
        out = D.densify_and_clone(state, 0.1, scene_extent=100.0,
                                  percent_dense=0.01)
        assert int(out.num_active) == 45
        np.testing.assert_allclose(np.asarray(out.params["xyz"])[40:45],
                                   np.asarray(state.params["xyz"])[:5])

    def test_grow_adds_displaced_copies(self, rng):
        """Point growing (opt.add_point path): low-density points get
        attribute-copies at displaced positions inside the AABB
        (reference grow/add_point_by_mask, gaussian_model.py:632-713)."""
        state, _ = tiny_state(rng, n=40, cap=64)
        n0 = int(state.num_active)
        out, added = D.grow(state, density_threshold=1e-4,
                            displacement_scale=0.05, seed=0,
                            voxel_size=0.05)
        assert added > 0
        assert int(out.num_active) == n0 + added
        new_xyz = np.asarray(out.params["xyz"][n0:n0 + added])
        aabb = np.asarray(state.aabb)
        assert (new_xyz < aabb[0]).all() and (new_xyz > aabb[1]).all()
        # appended rows carry copied attributes and zeroed Adam moments
        sc_old = np.asarray(state.params["scaling"][:n0])
        sc_new = np.asarray(out.params["scaling"][n0:n0 + added])
        for row in sc_new:
            assert (np.abs(sc_old - row).sum(1) < 1e-6).any()
        assert np.asarray(out.opt.m["xyz"][n0:n0 + added]).sum() == 0.0

    def test_grow_no_candidates_is_noop(self, rng):
        state, _ = tiny_state(rng, n=40, cap=64)
        out, added = D.grow(state, density_threshold=1e9,
                            displacement_scale=0.05, seed=0, voxel_size=0.05)
        assert added == 0 and int(out.num_active) == int(state.num_active)

    def test_split_resamples_and_prunes_original(self, rng):
        state, _ = tiny_state(rng, n=40, cap=128)
        accum = np.zeros((128, 1), np.float32)
        accum[:3] = 10.0
        state = state.replace(
            xyz_gradient_accum=jnp.asarray(accum),
            denom=jnp.asarray(np.ones((128, 1), np.float32)))
        # big scaling on those 3 so they qualify for split
        scaling = np.asarray(state.params["scaling"]).copy()
        scaling[:3] = 1.0
        state = state.replace(params=dict(state.params,
                                          scaling=jnp.asarray(scaling)))
        out = D.densify_and_split(state, 0.1, scene_extent=1.0,
                                  percent_dense=0.01,
                                  rng_key=jax.random.PRNGKey(1))
        # 40 - 3 + 6 = 43
        assert int(out.num_active) == 43
        new_scales = np.asarray(out.params["scaling"])[37:43]
        np.testing.assert_allclose(new_scales,
                                   np.log(np.exp(1.0) / 1.6), atol=1e-5)

    def test_prune_by_opacity(self, rng):
        state, _ = tiny_state(rng, n=40, cap=64)
        op = np.asarray(state.params["opacity"]).copy()
        op[10:20] = -10.0  # sigmoid ~ 4.5e-5 < min_opacity
        state = state.replace(params=dict(state.params,
                                          opacity=jnp.asarray(op)))
        out = D.prune(state, 0.005, scene_extent=1.0, max_screen_size=0.0)
        assert int(out.num_active) == 30
        # remaining actives keep original relative order
        kept = np.asarray(out.params["xyz"])[:30]
        expected = np.concatenate([np.asarray(state.params["xyz"])[:10],
                                   np.asarray(state.params["xyz"])[20:40]])
        np.testing.assert_allclose(kept, expected)

    def test_reset_opacity(self, rng):
        state, _ = tiny_state(rng, n=40, cap=64)
        out = D.reset_opacity(state)
        op = np.asarray(jax.nn.sigmoid(out.params["opacity"]))[:40]
        assert (op <= 0.0101).all()
        assert np.asarray(out.opt.m["opacity"]).max() == 0.0

    def test_stats_accumulation(self, rng):
        state, _ = tiny_state(rng, n=40, cap=64)
        vs = np.zeros((64, 2), np.float32)
        vs[:10] = [3.0, 4.0]
        filt = np.zeros(64, bool)
        filt[:10] = True
        out = D.add_densification_stats(state, jnp.asarray(vs),
                                        jnp.asarray(filt))
        np.testing.assert_allclose(np.asarray(out.xyz_gradient_accum)[:10, 0],
                                   5.0)
        assert np.asarray(out.denom)[:10].sum() == 10


class TestTrainStepSmoke:
    @pytest.mark.slow
    def test_coarse_base_loss_decreases(self, rng):
        H = W = 32
        cam = make_camera(H, W)
        state, dcfg = tiny_state(rng, n=30, cap=32)
        settings = RasterSettings(H, W, sh_degree=0, lang_dim=3,
                                  include_feature=False, tile_capacity=32,
                                  composite_chunk=16, composite_tile_chunk=4)
        lr_cfg = LRConfig(
            position_lr_init=1.6e-3, position_lr_final=1.6e-5,
            position_lr_delay_mult=0.01, position_lr_max_steps=100,
            deformation_lr_init=1.6e-3, deformation_lr_final=1.6e-4,
            deformation_lr_delay_mult=0.01, grid_lr_init=1.6e-2,
            grid_lr_final=1.6e-3, feature_lr=0.0025, opacity_lr=0.05,
            scaling_lr=0.005, rotation_lr=0.001, language_feature_lr=0.0025)
        cfg = StepConfig(settings=settings, dcfg=dcfg, lr_cfg=lr_cfg,
                         stage="coarse-base", batch_size=1)
        gt = jnp.asarray(rng.uniform(size=(1, 3, H, W)).astype(np.float32))
        batch = Batch(
            cams=jax.tree.map(lambda x: x[None], cam),
            times=jnp.zeros((1,)),
            gt_images=gt,
            gt_lang=jnp.zeros((1, 3, H, W)),
            lang_mask=jnp.ones((1, 1, H, W)))
        bg = jnp.zeros(3)

        losses_seen = []
        for it in range(1, 16):
            state, metrics, vs_grad, vis, radii = train_step(
                cfg, state, batch, bg, jnp.asarray(it), 0)
            losses_seen.append(float(metrics["loss"]))
        assert np.isfinite(losses_seen).all()
        assert losses_seen[-1] < losses_seen[0]

    @pytest.mark.slow
    def test_fine_lang_trains_language(self, rng):
        H = W = 32
        cam = make_camera(H, W)
        state, dcfg = tiny_state(rng, n=30, cap=32)
        settings = RasterSettings(H, W, sh_degree=0, lang_dim=3,
                                  include_feature=True, tile_capacity=32,
                                  composite_chunk=16, composite_tile_chunk=4)
        lr_cfg = LRConfig(
            position_lr_init=1.6e-3, position_lr_final=1.6e-5,
            position_lr_delay_mult=0.01, position_lr_max_steps=100,
            deformation_lr_init=1.6e-3, deformation_lr_final=1.6e-4,
            deformation_lr_delay_mult=0.01, grid_lr_init=1.6e-2,
            grid_lr_final=1.6e-3, feature_lr=0.0025, opacity_lr=0.05,
            scaling_lr=0.005, rotation_lr=0.001, language_feature_lr=0.01)
        cfg = StepConfig(settings=settings, dcfg=dcfg, lr_cfg=lr_cfg,
                         stage="fine-lang", no_dlang=False, lam=1.0)
        gt_lang = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        gt_lang /= np.linalg.norm(gt_lang, axis=1, keepdims=True) + 1e-9
        batch = Batch(
            cams=jax.tree.map(lambda x: x[None], cam),
            times=jnp.full((1,), 0.3),
            gt_images=jnp.zeros((1, 3, H, W)),
            gt_lang=jnp.asarray(gt_lang),
            lang_mask=jnp.ones((1, 1, H, W)))
        bg = jnp.zeros(3)
        xyz_before = np.asarray(state.params["xyz"]).copy()
        lang_before = np.asarray(state.params["language_feature"]).copy()
        first = last = None
        for it in range(1, 11):
            state, metrics, *_ = train_step(cfg, state, batch, bg,
                                            jnp.asarray(it), 0)
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert np.isfinite(last)
        assert last < first
        # language features moved; gaussian geometry frozen (not joint)
        assert not np.allclose(np.asarray(state.params["language_feature"]),
                               lang_before)
        np.testing.assert_array_equal(np.asarray(state.params["xyz"]),
                                      xyz_before)


class TestCheckpointRoundtrip:
    def test_full_state_checkpoint(self, rng, tmp_path):
        from langsplat4d.train.loop import load_checkpoint, save_checkpoint
        state, _ = tiny_state(rng, n=30, cap=64)
        save_checkpoint(state, 7, "fine-lang", str(tmp_path))
        back, payload = load_checkpoint(
            str(tmp_path / "chkpnt_fine-lang_7.pth"))
        assert payload["iteration"] == 7
        assert int(back.num_active) == 30
        np.testing.assert_array_equal(np.asarray(back.params["xyz"]),
                                      np.asarray(state.params["xyz"]))
        np.testing.assert_array_equal(
            np.asarray(back.opt.m["opacity"]),
            np.asarray(state.opt.m["opacity"]))


class TestDiscreteStagePrep:
    def test_expand_language_features(self, rng):
        from langsplat4d.config import Config
        from langsplat4d.train.loop import prepare_discrete_stage
        state, dcfg = tiny_state(rng, n=20, cap=32)
        lf = rng.normal(size=(32, 3)).astype(np.float32)
        state = state.replace(params=dict(state.params,
                                          language_feature=jnp.asarray(lf)))
        cfg = Config()
        cfg.runtime.language_feature_hiddendim = 3
        cfg.runtime.centers_num = 3
        out = prepare_discrete_stage(cfg, state, dcfg,
                                     init_from_stage="fine-base")
        assert out.params["language_feature"].shape == (32, 9)
        # reference layout: [n, centers, dim] -> permute(0,2,1) -> flatten
        flat = np.asarray(out.params["language_feature"])[0]
        as_centers = flat.reshape(3, 3).T  # undo permute -> [centers, dim]
        lf0 = lf[0] / (np.linalg.norm(lf[0]) + 1e-9)
        # noisy copies around the normalized static feature (std 0.05)
        assert np.linalg.norm(as_centers - lf0[None], axis=-1).max() < 0.5


class TestStreamTrainTuning:
    def test_tune_and_audit(self, rng):
        """_tune_stream_train sizes a chunk-multiple budget from the scene
        and its audit closure bumps the budget only when demand outgrows
        the margin (no pallas involved — pure sizing logic)."""
        import dataclasses
        from langsplat4d.config import Config
        from langsplat4d.train.loop import _tune_stream_train

        state, dcfg = tiny_state(rng, n=40, cap=64)
        cam = make_camera(64, 64)

        class _View:
            def camera_params(self):
                return cam

        cams = [_View() for _ in range(5)]
        cfg = Config()
        settings = RasterSettings(64, 64, sh_degree=0, lang_dim=3,
                                  include_feature=True,
                                  stream_train_chunk=128)
        tuned, audit = _tune_stream_train(cfg, settings, cams, state)
        assert tuned.stream_train
        assert tuned.stream_budget > 0
        assert tuned.stream_budget % tuned.stream_train_chunk == 0
        assert len(tuned.stream_tiers) >= 1

        # demand unchanged -> no re-spec
        assert audit(tuned, state, cams[0]) is None
        # force a tiny budget -> audit must bump it to a chunk multiple
        small = dataclasses.replace(tuned, stream_budget=128)
        bumped = audit(small, state, cams[0])
        assert bumped is not None
        assert bumped.stream_budget > 128
        assert bumped.stream_budget % tuned.stream_train_chunk == 0
