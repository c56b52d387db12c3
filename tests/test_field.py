"""Field-layer tests: grid_sample parity vs torch, HexPlane behavior,
deformation gates, regularizers, torch checkpoint interop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.field import hexplane as hp
from langsplat4d.field.deformation import (
    DeformConfig, deform_forward, init_deform_params)
from langsplat4d.field.nets import poc_fre, poc_freqs
from langsplat4d.ops.grid_sample import grid_sample_2d


class TestGridSample:
    def test_matches_torch_grid_sample(self, rng):
        import torch
        import torch.nn.functional as F
        C, H, W, n = 5, 9, 13, 200
        plane = rng.normal(size=(C, H, W)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(n, 2)).astype(np.float32)
        ours = np.asarray(grid_sample_2d(jnp.asarray(plane),
                                         jnp.asarray(coords)))
        ref = F.grid_sample(
            torch.from_numpy(plane)[None],
            torch.from_numpy(coords)[None, None],
            align_corners=True, mode="bilinear", padding_mode="border",
        )[0, :, 0].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_gradient_parity_vs_torch(self, rng):
        import torch
        import torch.nn.functional as F
        C, H, W, n = 3, 8, 8, 50
        plane = rng.normal(size=(C, H, W)).astype(np.float32)
        coords = rng.uniform(-0.9, 0.9, size=(n, 2)).astype(np.float32)

        g_ours = jax.grad(lambda p: jnp.sum(
            grid_sample_2d(p, jnp.asarray(coords)) ** 2))(jnp.asarray(plane))

        tp = torch.from_numpy(plane)[None].requires_grad_(True)
        out = F.grid_sample(tp, torch.from_numpy(coords)[None, None],
                            align_corners=True, mode="bilinear",
                            padding_mode="border")
        (out ** 2).sum().backward()
        np.testing.assert_allclose(np.asarray(g_ours), tp.grad[0].numpy(),
                                   atol=1e-4)


class TestHexPlane:
    def cfg(self):
        return {"output_coordinate_dim": 4,
                "resolution": [8, 8, 8, 5]}

    def test_init_shapes_and_time_planes_ones(self):
        params = hp.init_hexplane(jax.random.PRNGKey(0), self.cfg(), [1, 2])
        assert len(params["grids"]) == 2
        assert len(params["grids"][0]) == 6
        # spatial plane xy scale 1: [C, reso_y, reso_x]
        assert params["grids"][0][0].shape == (4, 8, 8)
        # time plane xt is comb id 2: [C, time_reso, x_reso]; init to ones
        assert params["grids"][0][2].shape == (4, 5, 8)
        np.testing.assert_array_equal(np.asarray(params["grids"][0][2]), 1.0)
        # yz is comb id 3, spatial-initialized
        assert params["grids"][0][3].shape == (4, 8, 8)
        # scale 2 multiplies spatial only
        assert params["grids"][1][0].shape == (4, 16, 16)
        assert params["grids"][1][2].shape == (4, 5, 16)

    def test_query_shapes_and_static_time_identity(self, rng):
        params = hp.init_hexplane(jax.random.PRNGKey(0), self.cfg(), [1])
        aabb = hp.default_aabb(1.6)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(10, 3)).astype(np.float32))
        f1 = hp.hexplane_query(params, aabb, pts, jnp.zeros((10, 1)))
        f2 = hp.hexplane_query(params, aabb, pts, jnp.full((10, 1), 0.7))
        assert f1.shape == (10, 4)
        # time planes are all-ones at init -> features time-invariant
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)

    def test_regularizers_nonnegative(self, rng):
        params = hp.init_hexplane(jax.random.PRNGKey(1), self.cfg(), [1, 2])
        assert float(hp.plane_tv_loss(params)) >= 0
        assert float(hp.time_smoothness_loss(params)) >= 0
        # time planes init to ones -> l1(1-plane) is exactly 0 at init
        np.testing.assert_allclose(float(hp.l1_time_planes_loss(params)),
                                   0.0, atol=1e-7)


class TestDeformation:
    def setup_io(self, rng, n=20, cfg=None):
        cfg = cfg or DeformConfig(net_width=16, posebase_pe=2,
                                  kplanes_out_dim=4,
                                  kplanes_resolution=(8, 8, 8, 4),
                                  multires=(1,), lang_dim=3)
        params = init_deform_params(jax.random.PRNGKey(0), cfg)
        aabb = jnp.asarray([[1.6] * 3, [-1.6] * 3])
        io = dict(
            xyz=jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
            scales=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            rotations=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
            opacity=jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)),
            shs=jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32)),
            lang=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            times=jnp.full((n, 1), 0.4),
        )
        return cfg, params, aabb, io

    def test_default_gates(self, rng):
        """Defaults: dx/ds/dr on; do/dshs OFF (passthrough); dlang on when
        no_dlang=False."""
        import dataclasses
        cfg, params, aabb, io = self.setup_io(rng)
        cfg = dataclasses.replace(cfg, no_dlang=False)
        out = deform_forward(params, cfg, aabb, **io)
        pts, scales, rots, opac, shs, lang, coff = out
        assert not np.allclose(np.asarray(pts), np.asarray(io["xyz"]))
        assert not np.allclose(np.asarray(scales), np.asarray(io["scales"]))
        np.testing.assert_array_equal(np.asarray(opac),
                                      np.asarray(io["opacity"]))
        np.testing.assert_array_equal(np.asarray(shs), np.asarray(io["shs"]))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(lang), axis=-1),
                                   1.0, atol=1e-4)
        assert coff is None

    def test_no_dlang_passthrough(self, rng):
        cfg, params, aabb, io = self.setup_io(rng)  # no_dlang=True default
        out = deform_forward(params, cfg, aabb, **io)
        np.testing.assert_array_equal(np.asarray(out[5]),
                                      np.asarray(io["lang"]))

    def test_discrete_mode_mixes_centers(self, rng):
        import dataclasses
        cfg, params, aabb, io = self.setup_io(rng)
        cfg = dataclasses.replace(cfg, use_discrete_lang_f=True,
                                  centers_num=3)
        io = dict(io, lang=jnp.asarray(
            rng.normal(size=(20, 9)).astype(np.float32)))
        out = deform_forward(params, cfg, aabb, **io)
        lang, coff = out[5], out[6]
        assert lang.shape == (20, 3)
        assert coff.shape == (20, 3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(lang), axis=-1),
                                   1.0, atol=1e-4)



    def test_spatial_cache_equals_uncached(self, rng):
        cfg, params, aabb, io = self.setup_io(rng)
        from langsplat4d.field.deformation import make_grid_spatial_cache
        cache = make_grid_spatial_cache(params, cfg, aabb, io["xyz"])
        base = deform_forward(params, cfg, aabb, **io)
        cached = deform_forward(params, cfg, aabb, **io, grid_spatial=cache)
        for a, b in zip(base[:-1], cached[:-1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_defor_depth_zero_matches_reference_single_linear(self, rng):
        """Reference defor_depth=0 (Neu3D/D-NeRF presets) still builds one
        Linear(feat_in, W) trunk (scene/deformation.py:52-60)."""
        cfg0 = DeformConfig(net_width=16, posebase_pe=2, kplanes_out_dim=4,
                            kplanes_resolution=(8, 8, 8, 4), multires=(1,),
                            lang_dim=3, defor_depth=0)
        cfg, params, aabb, io = self.setup_io(rng, cfg=cfg0)
        assert len(params["feature_out"]) == 1
        assert params["feature_out"][0]["w"].shape == (4, 16)
        out = deform_forward(params, cfg, aabb, **io)
        assert out[0].shape == io["xyz"].shape

    def test_empty_voxel_gate(self, rng):
        """empty_voxel ablation (scene/deformation.py:30-33,107-112): the
        DenseGrid mask scales base values; with the ones-initialized grid and
        in-AABB points the mask is exactly 1, matching the default gate."""
        cfg0 = DeformConfig(net_width=16, posebase_pe=2, kplanes_out_dim=4,
                            kplanes_resolution=(8, 8, 8, 4), multires=(1,),
                            lang_dim=3, empty_voxel=True)
        cfg, params, aabb, io = self.setup_io(rng, cfg=cfg0)
        assert params["empty_voxel"].shape == (1, 64, 64, 64)
        out = deform_forward(params, cfg, aabb, **io)
        base_cfg = DeformConfig(**{**cfg.__dict__, "empty_voxel": False})
        base_params = dict(params)
        base_params.pop("empty_voxel")
        ref = deform_forward(base_params, base_cfg, aabb, **io)
        for a, b in zip(out[:-1], ref[:-1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_dense_grid_matches_torch_grid_sample(self, rng):
        """dense_grid_query == reference DenseGrid.forward
        (scene/grid.py:26-37): flipped-coord trilinear grid_sample with
        align_corners=True and zeros padding, including out-of-AABB points."""
        import torch
        import torch.nn.functional as F
        from langsplat4d.field.hexplane import dense_grid_query
        grid = rng.normal(size=(2, 5, 6, 7)).astype(np.float32)
        aabb = np.array([[1.6, 1.5, 1.4], [-1.6, -1.5, -1.4]], np.float32)
        pts = rng.uniform(-2.0, 2.0, size=(50, 3)).astype(np.float32)
        ours = np.asarray(dense_grid_query(jnp.asarray(grid),
                                           jnp.asarray(aabb),
                                           jnp.asarray(pts)))
        tg = torch.from_numpy(grid)[None]
        xyz = torch.from_numpy(pts).reshape(1, 1, 1, -1, 3)
        ind = ((xyz - torch.from_numpy(aabb[1]))
               / torch.from_numpy(aabb[0] - aabb[1])).flip((-1,)) * 2 - 1
        ref = F.grid_sample(tg, ind, mode="bilinear", align_corners=True)
        ref = ref.reshape(2, -1).T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_poc_fre_matches_torch_layout(self, rng):
        import torch
        x = rng.normal(size=(5, 3)).astype(np.float32)
        freqs = poc_freqs(4)
        ours = np.asarray(poc_fre(jnp.asarray(x), freqs))
        tx = torch.from_numpy(x)
        buf = torch.FloatTensor([2 ** i for i in range(4)])
        emb = (tx.unsqueeze(-1) * buf).flatten(-2)
        ref = torch.cat([tx, emb.sin(), emb.cos()], -1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestInterop:
    def test_deformation_pth_roundtrip(self, rng, tmp_path):
        from langsplat4d.interop import (load_deformation, save_deformation)
        cfg = DeformConfig(net_width=16, posebase_pe=2, kplanes_out_dim=4,
                           kplanes_resolution=(8, 8, 8, 4), multires=(1,),
                           lang_dim=3, no_dlang=False)
        params = init_deform_params(jax.random.PRNGKey(3), cfg)
        save_deformation(str(tmp_path), params, cfg=cfg)
        template = init_deform_params(jax.random.PRNGKey(9), cfg)
        back = load_deformation(str(tmp_path), template)

        aabb = jnp.asarray([[1.6] * 3, [-1.6] * 3])
        io = [jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
              jnp.full((8, 1), 0.2)]
        a = deform_forward(params, cfg, aabb, *io)
        b = deform_forward(back, cfg, aabb, *io)
        for x, y in zip(a[:6], b[:6]):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)

    def test_state_dict_keys_match_reference_naming(self):
        from langsplat4d.interop import deform_params_to_torch_state_dict
        cfg = DeformConfig(net_width=16, posebase_pe=2, kplanes_out_dim=4,
                           kplanes_resolution=(8, 8, 8, 4), multires=(1, 2),
                           lang_dim=3)
        params = init_deform_params(jax.random.PRNGKey(0), cfg)
        sd = deform_params_to_torch_state_dict(params, cfg)
        # reference module naming (scene/deformation.py)
        assert "deformation_net.grid.grids.0.0" in sd
        assert "deformation_net.grid.grids.1.5" in sd
        assert "deformation_net.feature_out.0.weight" in sd
        assert "deformation_net.pos_deform.1.weight" in sd
        assert "deformation_net.pos_deform.3.weight" in sd
        assert "deformation_net.lang_deform.5.weight" in sd
        assert "timenet.0.weight" in sd and "timenet.2.weight" in sd
        assert sd["deformation_net.grid.grids.0.0"].shape == (1, 4, 8, 8)
        assert sd["deformation_net.pos_deform.3.weight"].shape == (3, 16)
