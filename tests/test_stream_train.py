"""Stream-binned training composite (render/stream_vjp.py): build
invariants, primal equality, and gradient equality against the tile-list
analytic-VJP path (whose gradients are FD-validated in test_raster.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import langsplat4d.render.raster as R
from tests.test_raster import make_camera, random_scene


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _scene(rng, n=96, H=64, W=64, **kw):
    cam = make_camera(H, W)
    base = dict(sh_degree=0, lang_dim=3, include_feature=True,
                tile_capacity=128, composite_chunk=32,
                composite_tile_chunk=4)
    base.update(kw)
    settings = R.RasterSettings(H, W, **base)
    means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
    arrs = tuple(jnp.asarray(a) for a in
                 (means, scales, quats, opac, colors, lang))
    return cam, settings, arrs


TIERS = ((3, 128), (6, 128), (16, 128))


class TestBuildStreamTrain:
    def test_alignment_and_segment_parity(self, rng):
        """Aligned starts are chunk multiples; every tile's valid slots map
        to the SAME Gaussians in the SAME depth order as the narrow render
        build's segments."""
        from langsplat4d.render.stream import (build_stream_narrow,
                                               build_stream_train)
        cam, settings, (means, scales, quats, opac, colors, lang) = \
            _scene(rng)
        n = means.shape[0]
        prep = R.preprocess(settings, cam, means, jnp.zeros((n, 2)), opac,
                            scales, quats, None, colors_precomp=colors)
        g = 32
        info = jax.jit(lambda p: build_stream_train(
            settings, p, tiers=TIERS, budget=4096, chunk=g))(prep)
        rows_ref, starts_ref, nv_ref = jax.jit(
            lambda p, f: build_stream_narrow(
                settings, p, f, tiers=TIERS, budget=4096))(prep, lang)

        starts = np.asarray(info["starts"])
        src = np.asarray(info["src"])
        valid = np.asarray(info["valid"])
        ctile = np.asarray(info["chunk_tile"])
        assert int(info["n_valid"]) == int(nv_ref)
        assert (starts % g == 0).all()
        assert (np.diff(starts) >= g).all()          # every tile >= 1 chunk

        # per-chunk ownership: chunk c covers slots [c*g, (c+1)*g) and its
        # owning tile's aligned segment must contain it (or it is a tail
        # chunk with no valid slots)
        sref = np.asarray(starts_ref)
        rref = np.asarray(rows_ref)
        xs = np.asarray(prep["point_image"][:, 0])
        for t in range(settings.num_tiles):
            seg = src[starts[t]:starts[t + 1]]
            v = valid[starts[t]:starts[t + 1]]
            n_val = v.sum()
            assert n_val == sref[t + 1] - sref[t]
            assert v[:n_val].all() and not v[n_val:].any()
            # same Gaussians in the same order: compare via pix_x, an
            # injective-enough per-Gaussian attribute the render build
            # carries in its row table
            np.testing.assert_allclose(
                xs[seg[:n_val]], rref[0, sref[t]:sref[t + 1]], rtol=0,
                atol=0)
            # chunk ownership
            for c in range(starts[t] // g, starts[t + 1] // g):
                assert ctile[c] == t

    def test_overflow_reported(self, rng):
        """budget < demand: n_valid still reports the full demand (the
        loop's overflow telemetry)."""
        from langsplat4d.render.stream import build_stream_train
        cam, settings, (means, scales, quats, opac, colors, lang) = \
            _scene(rng)
        n = means.shape[0]
        prep = R.preprocess(settings, cam, means, jnp.zeros((n, 2)), opac,
                            scales, quats, None, colors_precomp=colors)
        info = jax.jit(lambda p: build_stream_train(
            settings, p, tiers=TIERS, budget=64, chunk=32))(prep)
        assert int(info["n_valid"]) > 64


@pytest.fixture
def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _raster_image(settings, cam, arrs, bg):
    means, scales, quats, opac, colors, lang = arrs
    n = means.shape[0]
    rendered, lang_img, _, depth = R.rasterize(
        settings, cam, means, jnp.zeros((n, 2)), opac, scales, quats,
        None, colors, lang, bg)
    return rendered, lang_img, depth


class TestStreamTrainComposite:
    def test_primal_matches_tilelist(self, rng, _interpret):
        """Stream-train forward == tile-list analytic forward (both exact
        on a scene without capacity truncation)."""
        cam, settings, arrs = _scene(rng)
        bg = jnp.asarray([0.2, 0.1, 0.3])
        ref = _raster_image(
            dataclasses_replace(settings, analytic_vjp=True), cam, arrs, bg)
        out = _raster_image(
            dataclasses_replace(
                settings, stream_train=True, stream_tiers=TIERS,
                stream_budget=4096, stream_train_chunk=32), cam, arrs, bg)
        for a, b, what in zip(out, ref, ("rgb", "lang", "depth")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5, err_msg=what)

    def test_grad_matches_tilelist(self, rng, _interpret):
        """End-to-end input gradients of the stream-train path equal the
        tile-list analytic path's (FD-validated in test_raster)."""
        cam, settings, arrs = _scene(rng, n=64)
        bg = jnp.zeros(3)
        w_r = jnp.asarray(np.random.default_rng(3).normal(
            size=(3, settings.image_height, settings.image_width)),
            jnp.float32)
        w_l = jnp.asarray(np.random.default_rng(4).normal(
            size=(3, settings.image_height, settings.image_width)),
            jnp.float32)

        def loss(s, means, scales, quats, opac, colors, lang):
            n = means.shape[0]
            rendered, lang_img, _, _ = R.rasterize(
                s, cam, means, jnp.zeros((n, 2)), opac, scales, quats,
                None, colors, lang, bg)
            return jnp.sum(rendered * w_r) + jnp.sum(lang_img * w_l)

        means, scales, quats, opac, colors, lang = arrs
        args = (means, scales, quats, opac, colors, lang)
        g_ref = jax.grad(lambda *a: loss(
            dataclasses_replace(settings, analytic_vjp=True), *a),
            argnums=tuple(range(6)))(*args)
        g_out = jax.grad(lambda *a: loss(
            dataclasses_replace(
                settings, stream_train=True, stream_tiers=TIERS,
                stream_budget=4096, stream_train_chunk=32), *a),
            argnums=tuple(range(6)))(*args)
        names = ("means", "scales", "quats", "opacity", "colors", "lang")
        for a, b, what in zip(g_out, g_ref, names):
            # rtol absorbs chunk-alignment float-accumulation divergence
            # (different summation order in the S-suffix recurrences;
            # observed max ~7e-4 relative on a few percent of elements)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5,
                err_msg=what)


def dataclasses_replace(settings, **kw):
    import dataclasses
    return dataclasses.replace(settings, **kw)


class TestStreamTrainCorners:
    def test_base_stage_no_features(self, rng, _interpret):
        """include_feature=False (base stages): c_feat = rgb+depth only —
        the stream-train primal must still match the tile-list path."""
        cam, settings, arrs = _scene(rng, include_feature=False)
        means, scales, quats, opac, colors, lang = arrs
        n = means.shape[0]
        bg = jnp.asarray([0.2, 0.1, 0.3])
        st = dataclasses_replace(
            settings, stream_train=True, stream_tiers=TIERS,
            stream_budget=4096, stream_train_chunk=32)
        ref = R.rasterize(settings, cam, means, jnp.zeros((n, 2)), opac,
                          scales, quats, None, colors, jnp.zeros((n, 0)), bg)
        out = R.rasterize(st, cam, means, jnp.zeros((n, 2)), opac,
                          scales, quats, None, colors, jnp.zeros((n, 0)), bg)
        for a, b, what in zip(out, ref, ("rgb", "lang", "radii", "depth")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5, err_msg=what)
