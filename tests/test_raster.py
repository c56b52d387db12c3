"""Golden-value and gradient tests for the TPU rasterizer.

The naive compositor here is an independent per-pixel numpy implementation of
the CUDA forward semantics (front-to-back blending, alpha<1/255 skip, T<1e-4
stop) used as the slow reference (SURVEY §4 test strategy).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.core.transforms import (
    world_to_view, projection_matrix, quat_to_rotmat)
from langsplat4d.render import raster as R


def make_camera(H=64, W=64, fovx=1.0, fovy=1.0, cam_z=-5.0):
    Rm = np.eye(3)
    T = np.array([0.0, 0.0, -cam_z])  # world origin at depth -cam_z
    world_view = world_to_view(Rm, T).T            # stored transposed
    proj = projection_matrix(0.01, 100.0, fovx, fovy).T
    full = world_view @ proj
    campos = np.linalg.inv(world_view)[3, :3]
    cam = R.CameraParams(
        viewmatrix=jnp.asarray(world_view),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(campos),
        tanfovx=jnp.asarray(np.tan(fovx / 2), jnp.float32),
        tanfovy=jnp.asarray(np.tan(fovy / 2), jnp.float32),
    )
    return cam


def random_scene(rng, n=120, spread=1.2):
    means = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(-1.0, 1.0, size=n)
    scales = np.exp(rng.uniform(-3.5, -2.2, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    lang = rng.normal(size=(n, 3)).astype(np.float32)
    lang /= np.linalg.norm(lang, axis=-1, keepdims=True) + 1e-9
    return means, scales, quats, opac, colors, lang


def naive_composite(prep, order, colors, lang, bg, H, W):
    """Per-pixel reference loop (CUDA renderCUDA semantics)."""
    xy = np.asarray(prep["point_image"])
    con = np.asarray(prep["conic"])
    op = np.asarray(prep["opacity"])
    dep = np.asarray(prep["depth"])
    vis = np.asarray(prep["visible"])
    rmin = np.asarray(prep["rect_min"])
    rmax = np.asarray(prep["rect_max"])
    L = lang.shape[1]
    out = np.zeros((3 + L + 2, H, W), np.float32)
    for py in range(H):
        for px in range(W):
            T = 1.0
            acc = np.zeros(3 + L + 1, np.float32)
            tx, ty = px // 16, py // 16
            for g in order:
                if not vis[g]:
                    continue
                # CUDA tile-rect culling: a Gaussian touches this pixel only
                # if the pixel's tile lies in the Gaussian's rect.
                if not (rmin[g, 0] <= tx < rmax[g, 0]
                        and rmin[g, 1] <= ty < rmax[g, 1]):
                    continue
                dx = xy[g, 0] - px
                dy = xy[g, 1] - py
                power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                         - con[g, 1] * dx * dy)
                if power > 0:
                    continue
                alpha = min(0.99, op[g] * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                feat = np.concatenate([colors[g], lang[g], [dep[g]]])
                acc += feat * alpha * T
                T = test_T
            out[:3, py, px] = acc[:3] + T * bg
            out[3:3 + L, py, px] = acc[3:3 + L]
            out[3 + L, py, px] = acc[3 + L]
            out[3 + L + 1, py, px] = T
    return out


class TestPreprocess:
    def test_center_gaussian_projects_to_image_center(self):
        cam = make_camera()
        settings = R.RasterSettings(64, 64, sh_degree=0, lang_dim=0,
                                    tile_capacity=64, composite_chunk=32)
        means = jnp.zeros((1, 3))
        prep = R.preprocess(
            settings, cam, means, jnp.zeros((1, 2)),
            jnp.ones((1, 1)) * 0.9, jnp.ones((1, 3)) * 0.05,
            jnp.asarray([[1.0, 0, 0, 0]]), None,
            colors_precomp=jnp.ones((1, 3)))
        pi = np.asarray(prep["point_image"])[0]
        # ndc 0 -> pixel (W-1)/2
        np.testing.assert_allclose(pi, [31.5, 31.5], atol=1e-4)
        assert bool(prep["visible"][0])

    def test_ewa_cov2d_matches_monte_carlo(self, rng):
        """Propagate samples of N(mean, cov3d) through the exact projection and
        compare the empirical pixel covariance with the analytic EWA one."""
        cam = make_camera()
        settings = R.RasterSettings(64, 64, sh_degree=0, lang_dim=0)
        mean = np.array([[0.3, -0.2, 0.4]], np.float32)
        scales = np.array([[0.05, 0.08, 0.03]], np.float32)
        quat = rng.normal(size=(1, 4)).astype(np.float32)
        quat /= np.linalg.norm(quat)
        prep = R.preprocess(
            settings, cam, jnp.asarray(mean), jnp.zeros((1, 2)),
            jnp.ones((1, 1)), jnp.asarray(scales), jnp.asarray(quat), None,
            colors_precomp=jnp.ones((1, 3)))
        conic = np.asarray(prep["conic"])[0]
        det = conic[0] * conic[2] - conic[1] ** 2
        cov2d = np.array([[conic[2], -conic[1]], [-conic[1], conic[0]]]) / det
        cov2d -= 0.3 * np.eye(2)  # remove low-pass dilation

        # Monte-Carlo through the exact nonlinear projection
        Rm = np.asarray(quat_to_rotmat(jnp.asarray(quat))[0])
        L = Rm * scales[0]
        cov3d = L @ L.T
        samples = rng.multivariate_normal(mean[0], cov3d, size=200000)
        ph = np.concatenate([samples, np.ones((len(samples), 1))], axis=1)
        proj = ph @ np.asarray(cam.projmatrix)
        ndc = proj[:, :2] / (proj[:, 3:4] + 1e-7)
        pix = ((ndc + 1) * np.array([64, 64]) - 1) * 0.5
        emp = np.cov(pix.T)
        np.testing.assert_allclose(cov2d, emp, rtol=0.05, atol=0.02)


class TestRasterGolden:
    @pytest.mark.parametrize("lang_dim", [0, 3])
    def test_matches_naive_compositor(self, rng, lang_dim):
        H = W = 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=lang_dim,
            include_feature=lang_dim > 0,
            tile_capacity=128, composite_chunk=32, bin_tile_chunk=8,
            composite_tile_chunk=8)
        means, scales, quats, opac, colors, lang = random_scene(rng)
        lang = lang[:, :lang_dim] if lang_dim else np.zeros((len(means), 0),
                                                            np.float32)
        bg = np.array([1.0, 1.0, 1.0], np.float32)

        # Hermetic staging: materialize prep as concrete device arrays and
        # feed them to bin+composite as jit *arguments*, so both the naive
        # reference and the compositor consume bit-identical inputs. (XLA
        # otherwise duplicates fused preprocess math into consumers with
        # different FMA contraction, which the exp() in alpha amplifies.)
        prep = jax.jit(
            lambda mn, dm, op, sc, qt, cl: R.preprocess(
                settings, cam, mn, dm, op, sc, qt, None, cl)
        )(jnp.asarray(means), jnp.zeros((len(means), 2)), jnp.asarray(opac),
          jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        prep = jax.tree.map(jnp.asarray, jax.device_get(prep))

        def staged(prep, lg, bgc):
            entries, valid = R.bin_tiles(settings, prep)
            feats = lg if settings.include_feature else jnp.zeros(
                (len(means), 0), jnp.float32)
            img, _ = R.composite_tiles(settings, prep, entries, valid, feats,
                                       bgc)
            return img

        img = jax.jit(staged)(prep, jnp.asarray(lang), jnp.asarray(bg))
        rendered = img[:3]
        lang_img = img[3:3 + lang_dim]
        depth_img = img[3 + lang_dim:4 + lang_dim]

        dep = np.asarray(prep["depth"])
        vis = np.asarray(prep["visible"])
        order = np.argsort(np.where(vis, dep, np.inf))
        ref = naive_composite(prep, order, colors, lang, bg, H, W)

        # Residual diffs: fp32-vs-fp64 roundoff in alpha/cumprod, plus rare
        # alpha~1/255 threshold flips (bounded by ~alpha_min * color).
        def check(a, b, bulk=5e-5, worst=5e-3):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert np.quantile(d, 0.99) < bulk, np.quantile(d, 0.99)
            assert d.max() < worst, d.max()

        check(rendered, ref[:3])
        if lang_dim:
            check(lang_img, ref[3:3 + lang_dim])
        check(np.asarray(depth_img)[0], ref[3 + lang_dim], bulk=5e-4,
              worst=5e-2)

    def test_radii_positive_only_for_visible(self, rng):
        H = W = 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(H, W, sh_degree=0, lang_dim=0,
                                    include_feature=False, tile_capacity=64,
                                    composite_chunk=32, composite_tile_chunk=8)
        means, scales, quats, opac, colors, _ = random_scene(rng, n=50)
        means[0] = [0, 0, 100.0]  # behind far plane region but still +z
        means[1] = [0, 0, -20.0]  # behind the camera
        _, _, radii, _ = R.rasterize(
            settings, cam, jnp.asarray(means), jnp.zeros((50, 2)),
            jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
            None, jnp.asarray(colors), jnp.zeros((50, 0)),
            jnp.zeros(3))
        radii = np.asarray(radii)
        assert radii[1] == 0.0  # culled: view z < 0.2
        assert (radii >= 0).all()


class TestRasterGrad:
    def test_grad_matches_finite_difference(self, rng):
        H = W = 32
        cam = make_camera(H, W)
        # hard_cutoffs off: the alpha>=1/255 and T<1e-4 cutoffs are step
        # discontinuities that finite differences cannot cross.
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=2, include_feature=True,
            tile_capacity=32, composite_chunk=16, bin_tile_chunk=4,
            composite_tile_chunk=4, hard_cutoffs=False)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=20)
        lang = lang[:, :2]
        bg = jnp.zeros(3)
        target = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

        def loss_fn(op, lg):
            rendered, lang_img, _, _ = R.rasterize(
                settings, cam, jnp.asarray(means), jnp.zeros((20, 2)),
                op, jnp.asarray(scales), jnp.asarray(quats), None,
                jnp.asarray(colors), lg, bg)
            return jnp.mean(jnp.abs(rendered - target)) + jnp.mean(lang_img ** 2)

        loss_fn = jax.jit(loss_fn)
        op0 = jnp.asarray(opac)
        lg0 = jnp.asarray(lang)
        g_op, g_lang = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(op0, lg0)
        # finite difference on a few entries
        eps = 1e-3
        for idx in [(0, 0), (5, 0), (12, 0)]:
            op_p = op0.at[idx].add(eps)
            op_m = op0.at[idx].add(-eps)
            fd = (loss_fn(op_p, lg0) - loss_fn(op_m, lg0)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g_op[idx]), np.asarray(fd),
                                       rtol=0.05, atol=1e-4)
        for idx in [(3, 1), (8, 0)]:
            lg_p = lg0.at[idx].add(eps)
            lg_m = lg0.at[idx].add(-eps)
            fd = (loss_fn(op0, lg_p) - loss_fn(op0, lg_m)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g_lang[idx]), np.asarray(fd),
                                       rtol=0.05, atol=1e-4)

    def test_viewspace_grad_flows(self, rng):
        """The NDC dummy input must receive gradients (densify stats source,
        train.py:352-354)."""
        H = W = 32
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=0, include_feature=False,
            tile_capacity=32, composite_chunk=16, composite_tile_chunk=4)
        means, scales, quats, opac, colors, _ = random_scene(rng, n=20)

        def loss_fn(dummy):
            rendered, _, _, _ = R.rasterize(
                settings, cam, jnp.asarray(means), dummy,
                jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
                None, jnp.asarray(colors), jnp.zeros((20, 0)), jnp.zeros(3))
            return jnp.sum(rendered ** 2)

        g = jax.jit(jax.grad(loss_fn))(jnp.zeros((20, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestTwoLevelBinning:
    def test_matches_direct_binning(self, rng):
        """Two-level (cell prefilter) binning must produce identical per-tile
        lists to the direct per-tile top-k when capacities are generous."""
        import dataclasses
        H = W = 96
        cam = make_camera(H, W)
        base = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=0, include_feature=False,
            tile_capacity=64, bin_tile_chunk=8, composite_tile_chunk=8,
            two_level_binning=False)
        two = dataclasses.replace(base, two_level_binning=True,
                                  bin_cell_tiles=2, cell_capacity=256)
        means, scales, quats, opac, colors, _ = random_scene(rng, n=150)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            base, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((150, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        prep = jax.tree.map(jnp.asarray, jax.device_get(prep))
        e1, v1 = jax.jit(lambda p: R.bin_tiles(base, p))(prep)
        e2, v2 = jax.jit(lambda p: R.bin_tiles(two, p))(prep)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # compare only valid slots (invalid slot indices are arbitrary)
        e1n, e2n = np.asarray(e1), np.asarray(e2)
        v = np.asarray(v1)
        np.testing.assert_array_equal(e1n[v], e2n[v])

    @staticmethod
    def _synthetic_prep(depths, rects):
        """Minimal prep dict: tile-space rects given directly."""
        n = len(depths)
        r = np.asarray(rects, np.float32)
        return dict(
            depth=jnp.asarray(depths, jnp.float32),
            visible=jnp.ones((n,), bool),
            rect_min=jnp.asarray(r[:, :2]),
            rect_max=jnp.asarray(r[:, 2:]),
        )

    def test_band_truncation_drops_farthest(self):
        """When a y-band saturates band_capacity, the *farthest* Gaussians
        are dropped and the surviving lists stay depth-sorted."""
        import dataclasses
        s = R.RasterSettings(32, 32, tile_capacity=8, bin_cell_tiles=2,
                             cell_capacity=8, band_capacity=3)
        # 5 gaussians, all covering tile (0,0) (band 0, cell 0)
        depths = [5.0, 1.0, 3.0, 2.0, 4.0]
        rects = [(0, 0, 1, 1)] * 5
        ents, valid, _ = jax.jit(lambda p: R.bin_cells(s, p))(
            self._synthetic_prep(depths, rects))
        ents, valid = np.asarray(ents), np.asarray(valid)
        assert valid[0].sum() == 3
        # nearest three (ids 1, 3, 2) in depth order; 4.0 and 5.0 dropped
        np.testing.assert_array_equal(ents[0][valid[0]], [1, 3, 2])

    def test_cell_capacity_above_band_capacity_pads(self):
        s = R.RasterSettings(32, 32, tile_capacity=4, bin_cell_tiles=2,
                             cell_capacity=8, band_capacity=2)
        ents, valid, rect = jax.jit(lambda p: R.bin_cells(s, p))(
            self._synthetic_prep([1.0, 2.0, 3.0], [(0, 0, 1, 1)] * 3))
        assert ents.shape == (1, 8) and valid.shape == (1, 8)
        assert np.asarray(valid)[0].sum() == 2  # band keeps 2, rest padded

    def test_binning_saturation_probe(self):
        s = R.RasterSettings(32, 32, tile_capacity=8, bin_cell_tiles=2,
                             cell_capacity=2, band_capacity=16)
        stats = jax.jit(lambda p: R.binning_saturation(s, p))(
            self._synthetic_prep([1.0, 2.0, 3.0], [(0, 0, 1, 1)] * 3))
        assert int(stats["band_max_count"]) == 3
        # the single populated cell is full (3 > kc=2); 1 of 1 cells
        assert float(stats["cell_full_frac"]) == 1.0
        assert float(stats["tile_full_frac"]) == 0.0  # k=8 > 2 entries

    def test_tile_capacity_above_row_capacity_pads(self):
        s = R.RasterSettings(32, 32, tile_capacity=8, bin_cell_tiles=2,
                             cell_capacity=16, band_capacity=16,
                             tile_row_capacity=2)
        ents, valid = jax.jit(lambda p: R.bin_tiles(s, p))(
            self._synthetic_prep([1.0, 2.0, 3.0, 4.0], [(0, 0, 1, 1)] * 4))
        ents, valid = np.asarray(ents), np.asarray(valid)
        assert ents.shape == (4, 8)
        assert valid[0].sum() == 2          # row list truncates to 2
        np.testing.assert_array_equal(ents[0][valid[0]], [0, 1])
        assert not valid[1:].any()          # other tiles uncovered


class TestTruncationError:
    def test_saturating_scene_psnr_bound(self, rng):
        """Quantify capacity truncation: a dense scene rendered with
        deliberately saturating band/cell/tile capacities vs the exact
        full-capacity render. Truncation drops the FARTHEST Gaussians of each
        list (selection is a front-to-back -depth top-k,
        render/raster.py:bin_cells), whose transmittance-weighted
        contribution is smallest — the image error must stay small even when
        every list is full."""
        from langsplat4d.train.losses import psnr
        n = 600
        means, scales, quats, opac, colors, lang = random_scene(rng, n=n,
                                                                spread=0.4)
        # semi-transparent so the early-out doesn't hide the truncated tail
        opac = np.full_like(opac, 0.35)
        cam = make_camera()
        args = (jnp.zeros((n, 2)), jnp.asarray(opac), jnp.asarray(scales),
                jnp.asarray(quats), None, jnp.asarray(colors),
                jnp.asarray(lang), jnp.zeros(3))

        exact = R.RasterSettings(image_height=64, image_width=64, sh_degree=0,
                                 lang_dim=3, tile_capacity=1024,
                                 bin_cell_tiles=2, cell_capacity=1024,
                                 band_capacity=1024, tile_row_capacity=1024,
                                 analytic_vjp=False)
        trunc = R.RasterSettings(image_height=64, image_width=64, sh_degree=0,
                                 lang_dim=3, tile_capacity=128,
                                 bin_cell_tiles=2, cell_capacity=256,
                                 band_capacity=384, tile_row_capacity=128,
                                 analytic_vjp=False)
        img_e, lang_e, _, _ = R.rasterize(exact, cam, jnp.asarray(means),
                                          *args)
        img_t, lang_t, _, _ = R.rasterize(trunc, cam, jnp.asarray(means),
                                          *args)

        # every binning level of the truncated config must actually saturate
        prep = R.preprocess(trunc, cam, jnp.asarray(means), jnp.zeros((n, 2)),
                            jnp.asarray(opac), jnp.asarray(scales),
                            jnp.asarray(quats), None, jnp.asarray(colors))
        sat = R.binning_saturation(trunc, prep)
        assert float(sat["band_max_count"]) > trunc.band_capacity
        assert float(sat["tile_full_frac"]) > 0.2

        d = float(psnr(img_t, img_e))
        assert d > 30.0, f"truncation PSNR {d:.1f} dB below bound"
        assert float(jnp.abs(lang_t - lang_e).mean()) < 0.02


class TestAnalyticVJP:
    """The analytic custom-VJP compositor must match the autodiff path in
    both the forward and all input gradients."""

    def _setup(self, rng, hard_cutoffs=True):
        import dataclasses
        from langsplat4d.render import composite_vjp as CV
        H = W = 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=3, include_feature=True,
            tile_capacity=128, composite_chunk=32, bin_tile_chunk=8,
            composite_tile_chunk=8, hard_cutoffs=hard_cutoffs)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=90)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            settings, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((90, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        prep = jax.tree.map(jnp.asarray, jax.device_get(prep))
        entries, valid = jax.jit(lambda p: R.bin_tiles(settings, p))(prep)
        packed = jnp.concatenate(
            [prep["point_image"], prep["conic"], prep["opacity"][:, None],
             prep["colors"], jnp.asarray(lang), prep["depth"][:, None]],
            axis=1)
        return settings, prep, entries, valid, packed

    @pytest.mark.parametrize("hard_cutoffs", [True, False])
    def test_forward_matches_reference_composite(self, rng, hard_cutoffs):
        from langsplat4d.render import composite_vjp as CV
        settings, prep, entries, valid, packed = self._setup(rng,
                                                             hard_cutoffs)
        bg = jnp.asarray([0.1, 0.5, 0.9])
        lang = packed[:, 9:12]
        ref_img, _ = jax.jit(lambda p, e, v: R.composite_tiles(
            settings, p, e, v, lang, bg))(prep, entries, valid)
        accum = jax.jit(lambda d, e, v, b: CV.composite_cv(
            settings, d, e, v, b))(packed, entries, valid, bg)
        ts = 16
        c_out = accum.shape[1]
        img = np.asarray(accum).reshape(settings.tiles_y, settings.tiles_x,
                                        c_out, ts, ts)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            c_out, settings.tiles_y * ts, settings.tiles_x * ts)
        np.testing.assert_allclose(img, np.asarray(ref_img), atol=2e-5)

    @pytest.mark.parametrize("hard_cutoffs", [True, False])
    def test_gradients_match_autodiff(self, rng, hard_cutoffs):
        from langsplat4d.render import composite_vjp as CV
        settings, prep, entries, valid, packed = self._setup(rng,
                                                             hard_cutoffs)
        bg = jnp.asarray([0.1, 0.5, 0.9])
        c_all = packed.shape[1] - 6
        tgt = jnp.asarray(rng.normal(
            size=(settings.num_tiles, c_all + 1, 256)).astype(np.float32))

        def loss_cv(d, b):
            acc = CV.composite_cv(settings, d, entries, valid, b)
            return jnp.sum(acc * tgt)

        def loss_ad(d, b):
            acc = CV.composite_forward(settings, d, entries, valid, b)
            return jnp.sum(acc * tgt)

        g_cv = jax.jit(jax.grad(loss_cv, argnums=(0, 1)))(packed, bg)
        g_ad = jax.jit(jax.grad(loss_ad, argnums=(0, 1)))(packed, bg)
        cols = {"point_image": (0, 2), "conic": (2, 5), "opacity": (5, 6),
                "feat_all": (6, 6 + c_all)}
        for key, (lo, hi) in cols.items():
            a = np.asarray(g_cv[0][:, lo:hi])
            b = np.asarray(g_ad[0][:, lo:hi])
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=2e-3 * scale, rtol=1e-3,
                                       err_msg=key)
        np.testing.assert_allclose(np.asarray(g_cv[1]), np.asarray(g_ad[1]),
                                   rtol=1e-4, err_msg="bg")


class TestAutotuneTiers:
    """Tier autotuning from a measured span distribution (render/stream.py
    autotune_tiers): exactness = every rung's capacity covers the count of
    Gaussians whose span exceeds the previous rung, and the ladder reaches
    the max observed span (driver retunes once per scene, render_set)."""

    def test_covers_demand_and_max_span(self):
        from langsplat4d.render.stream import autotune_tiers
        rng = np.random.default_rng(0)
        spans = np.concatenate([
            np.full(100_000, 2), np.full(40_000, 3), np.full(20_000, 5),
            np.full(3_000, 9), np.full(200, 14), np.full(40, 27)])
        rng.shuffle(spans)
        tiers = autotune_tiers(spans)
        prev = 2
        for span_i, cap_i in tiers:
            demand = int((spans > prev).sum())
            assert cap_i >= demand, (span_i, cap_i, demand)
            assert span_i > prev
            prev = span_i
        assert prev >= spans.max()

    def test_small_scene_single_tier(self):
        from langsplat4d.render.stream import autotune_tiers
        tiers = autotune_tiers(np.full(500, 2))
        # nothing spans beyond the universal 2x2 slots
        assert len(tiers) == 1

    def test_empty_spans(self):
        from langsplat4d.render.stream import autotune_tiers
        assert autotune_tiers(np.zeros(0, np.int64))[0][0] >= 3


class TestNarrowStream:
    """build_stream_narrow (render/stream.py): the 2-column-sort + budgeted
    Morton row-gather build must produce the same per-tile depth-ordered
    segments as the classic payload-carrying build, and the ellipse cull
    must only drop entries the compositor's alpha >= 1/255 cutoff would
    skip for every pixel of the tile."""

    def _build_both(self, rng, ellipse_cull, n=96, H=64, W=64):
        from langsplat4d.render.stream import (build_stream,
                                               build_stream_narrow)
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=3, include_feature=True,
            tile_capacity=64)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            settings, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((n, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        tiers = ((3, 64), (6, 64), (16, 64))
        rows_c, starts_c, _ = jax.jit(lambda p, f: build_stream(
            settings, p, f, tiers=tiers))(prep, jnp.asarray(lang))
        rows_n, starts_n, n_valid = jax.jit(lambda p, f: build_stream_narrow(
            settings, p, f, tiers=tiers, budget=4096,
            ellipse_cull=ellipse_cull))(prep, jnp.asarray(lang))
        return (settings, np.asarray(rows_c), np.asarray(starts_c),
                np.asarray(rows_n), np.asarray(starts_n), int(n_valid))

    def test_segments_match_classic(self, rng):
        (settings, rows_c, starts_c, rows_n, starts_n,
         n_valid) = self._build_both(rng, ellipse_cull=False)
        assert n_valid == starts_n[settings.num_tiles]
        for t in range(settings.num_tiles):
            seg_c = rows_c[:, starts_c[t]:starts_c[t + 1]]
            seg_n = rows_n[:, starts_n[t]:starts_n[t + 1]]
            np.testing.assert_allclose(seg_n, seg_c, rtol=0, atol=0,
                                       err_msg=f"tile {t}")

    def test_ellipse_cull_only_drops_invisible(self, rng):
        (settings, rows_c, starts_c, rows_n, starts_n,
         _) = self._build_both(rng, ellipse_cull=True)
        ts = settings.tile_size
        dropped_total = 0
        for t in range(settings.num_tiles):
            seg_c = rows_c[:, starts_c[t]:starts_c[t + 1]]
            seg_n = rows_n[:, starts_n[t]:starts_n[t + 1]]
            # culled build is a depth-ordered subsequence of the classic one
            keys_c = [tuple(seg_c[:, i]) for i in range(seg_c.shape[1])]
            keys_n = [tuple(seg_n[:, i]) for i in range(seg_n.shape[1])]
            it = iter(keys_c)
            assert all(k in it for k in keys_n), f"tile {t} not a subsequence"
            # every dropped entry: max alpha over the tile < 1/255
            tx, ty = t % settings.tiles_x, t // settings.tiles_x
            xs = np.arange(tx * ts, tx * ts + ts, dtype=np.float64)
            ys = np.arange(ty * ts, ty * ts + ts, dtype=np.float64)
            gx, gy = np.meshgrid(xs, ys)
            kept = set(keys_n)
            for k in keys_c:
                if k in kept:
                    continue
                px, py, a, b, c, ln_op = k[0], k[1], k[2], k[3], k[4], k[5]
                dx, dy = gx - px, gy - py
                q = a * dx * dx + 2 * b * dx * dy + c * dy * dy
                alpha = np.exp(ln_op) * np.exp(-0.5 * q)
                assert alpha.max() < 1.0 / 255.0, f"tile {t}"
                dropped_total += 1
        # the cull must actually fire on this scene
        assert dropped_total > 0

    def test_valid_count_matches_build(self, rng):
        """narrow_valid_count (the driver's budget sizer) must equal the
        n_valid the real build reports, for both cull settings."""
        from langsplat4d.render.stream import (build_stream_narrow,
                                               narrow_valid_count)
        n, H, W = 96, 64, 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=3, include_feature=True,
            tile_capacity=64)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            settings, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((n, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        tiers = ((3, 64), (6, 64), (16, 64))
        for cull in (False, True):
            _, _, n_valid = jax.jit(lambda p, f: build_stream_narrow(
                settings, p, f, tiers=tiers, budget=4096,
                ellipse_cull=cull))(prep, jnp.asarray(lang))
            n_est = jax.jit(lambda p: narrow_valid_count(
                settings, p, tiers=tiers, ellipse_cull=cull))(prep)
            assert int(n_est) == int(n_valid), (cull, int(n_est),
                                                int(n_valid))

    @pytest.mark.parametrize("single_key", [True, False])
    def test_wide_key_matches_packed(self, rng, monkeypatch, single_key):
        """The two-column wide key (capacity > 2^18 — the reference's 360k
        operating point, train.py:399) must produce BIT-IDENTICAL rows and
        starts to the packed-u32 narrow build: same valid slots, same
        (tile, depth-rank) order, same table gather. Forced at test scale
        by lowering the packed-key capacity threshold."""
        import dataclasses

        import langsplat4d.render.stream as S
        n, H, W = 96, 64, 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=3, include_feature=True,
            tile_capacity=64, stream_single_key=single_key)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            settings, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((n, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        tiers = ((3, 64), (6, 64), (16, 64))

        def build():
            return jax.jit(lambda p, f: S.build_stream_narrow(
                settings, p, f, tiers=tiers, budget=4096))(
                prep, jnp.asarray(lang))

        rows_p, starts_p, nv_p = build()
        assert n <= S.RANK_CAP           # packed path actually ran
        monkeypatch.setattr(S, "RANK_CAP", 16)   # force wide
        rows_w, starts_w, nv_w = build()
        assert int(nv_w) == int(nv_p)
        np.testing.assert_array_equal(np.asarray(starts_w),
                                      np.asarray(starts_p))
        # compare the VALID slot prefix only: slots past n_valid are
        # sentinel padding whose gathered rows are arbitrary (never read —
        # every tile segment ends within the valid prefix)
        nv = int(nv_p)
        assert nv > 0
        np.testing.assert_array_equal(np.asarray(rows_w)[:, :nv],
                                      np.asarray(rows_p)[:, :nv])

    def test_wide_key_train_build_matches_packed(self, rng, monkeypatch):
        """build_stream_train's wide mode (360k training): identical src /
        valid / starts / chunk_tile layout to the packed-key build."""
        import langsplat4d.render.stream as S
        n, H, W = 96, 64, 64
        cam = make_camera(H, W)
        settings = R.RasterSettings(
            H, W, sh_degree=0, lang_dim=3, include_feature=True,
            tile_capacity=64)
        means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
        prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
            settings, cam, mn, dm, op, sc, qt, None, cl))(
            jnp.asarray(means), jnp.zeros((n, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
        tiers = ((3, 64), (6, 64), (16, 64))

        def build():
            return jax.jit(lambda p: S.build_stream_train(
                settings, p, tiers=tiers, budget=4096, chunk=32))(prep)

        ref = build()
        monkeypatch.setattr(S, "RANK_CAP", 16)   # force wide
        out = build()
        for k in ("src", "valid", "starts", "chunk_tile", "n_valid"):
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(ref[k]), err_msg=k)
