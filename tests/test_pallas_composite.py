"""Pallas fused composite vs the golden jnp compositor (interpret mode on
CPU; the same kernel compiles for TPU)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.ops import tile_composite as TC
from langsplat4d.render import raster as R
from tests.test_raster import make_camera, random_scene


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run pallas kernels in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize("hard_cutoffs", [True, False])
def test_matches_jnp_composite(rng, hard_cutoffs):
    H = W = 64
    cam = make_camera(H, W)
    settings = R.RasterSettings(
        H, W, sh_degree=0, lang_dim=3, include_feature=True,
        tile_capacity=128, composite_chunk=32, bin_tile_chunk=8,
        composite_tile_chunk=8, hard_cutoffs=hard_cutoffs)
    means, scales, quats, opac, colors, lang = random_scene(rng, n=100)
    prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
        settings, cam, mn, dm, op, sc, qt, None, cl))(
        jnp.asarray(means), jnp.zeros((100, 2)), jnp.asarray(opac),
        jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
    prep = jax.tree.map(jnp.asarray, jax.device_get(prep))
    entries, valid = jax.jit(lambda p: R.bin_tiles(settings, p))(prep)
    bg = jnp.asarray([0.3, 0.6, 0.9])

    ref_img, ref_T = jax.jit(
        lambda p, e, v: R.composite_tiles(settings, p, e, v,
                                          jnp.asarray(lang), bg))(
        prep, entries, valid)

    rows, c_feat = TC.pack_rows(prep, entries, valid, jnp.asarray(lang))
    out = TC.composite_tiles_pallas(
        rows, bg, tiles_x=settings.tiles_x, tile_size=16, tb=4, g=32,
        hard_cutoffs=hard_cutoffs)
    # assemble [T, c_out, px] -> image like composite_tiles does
    ts = 16
    c_out = c_feat + 1
    img = np.asarray(out).reshape(settings.tiles_y, settings.tiles_x,
                                  c_out, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c_out, settings.tiles_y * ts,
                                               settings.tiles_x * ts)
    np.testing.assert_allclose(img, np.asarray(ref_img), atol=2e-5)


@pytest.mark.parametrize("hard_cutoffs", [True, False])
def test_cell_composite_matches_jnp(rng, hard_cutoffs):
    """Cell-list kernel == per-tile path when K is large enough that
    per-tile truncation never happens."""
    H = W = 64
    cam = make_camera(H, W)
    settings = R.RasterSettings(
        H, W, sh_degree=0, lang_dim=3, include_feature=True,
        tile_capacity=128, composite_chunk=32, bin_tile_chunk=8,
        composite_tile_chunk=8, bin_cell_tiles=2, cell_capacity=128,
        hard_cutoffs=hard_cutoffs)
    means, scales, quats, opac, colors, lang = random_scene(rng, n=100)
    args = (jnp.asarray(means), jnp.zeros((100, 2)), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), None,
            jnp.asarray(colors), jnp.asarray(lang), jnp.asarray([0.2, 0.5, 0.8]))

    ref = jax.jit(lambda *a: R.rasterize(settings, cam, *a))(*args)
    fast_settings = dataclasses.replace(settings, pallas_cell_composite=True)
    fast = jax.jit(lambda *a: R.rasterize(fast_settings, cam, *a))(*args)
    # rendered, lang, radii, depth
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(ref[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(fast[1]), np.asarray(ref[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(fast[3]), np.asarray(ref[3]),
                               atol=3e-4)


@pytest.mark.parametrize("hard_cutoffs", [True, False])
def test_stream_path_matches_list_path(rng, hard_cutoffs):
    """Stream binning (duplicate+sort, render/stream.py) + the
    ragged-segment kernel == the capacity-list path, including Gaussians
    large enough to exercise tiers 2 and 3."""
    H = W = 64
    cam = make_camera(H, W)
    base = dict(sh_degree=0, lang_dim=3, include_feature=True,
                tile_capacity=256, composite_chunk=32, bin_tile_chunk=8,
                composite_tile_chunk=8, hard_cutoffs=hard_cutoffs)
    settings = R.RasterSettings(H, W, **base)
    n = 120
    means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
    # a few big splats to push coverage into tiers 2/3
    scales[:6] *= 12.0
    scales[:2] *= 4.0
    args = (jnp.zeros((n, 2)), jnp.asarray(opac), jnp.asarray(scales),
            jnp.asarray(quats), None, jnp.asarray(colors),
            jnp.asarray(lang), jnp.asarray([0.3, 0.6, 0.9]))

    ref_set = R.RasterSettings(H, W, **base, analytic_vjp=False)
    ref = R.rasterize(ref_set, cam, jnp.asarray(means), *args)

    stream_set = R.RasterSettings(
        H, W, **base, stream_binning=True, pallas_tile_block=4,
        stream_tiers=((3, 64), (6, 16), (16, 8)))
    out = R.rasterize(stream_set, cam, jnp.asarray(means), *args)

    from langsplat4d.render.stream import stream_overflow
    prep = R.preprocess(ref_set, cam, jnp.asarray(means), *args[:4], None,
                        colors_precomp=jnp.asarray(colors))
    ov = stream_overflow(stream_set, prep,
                         tiers=((3, 64), (6, 16), (16, 8)))
    assert int(ov["span_exceeded"]) == 0

    for a, b, name in ((out[0], ref[0], "rgb"), (out[1], ref[1], "lang"),
                       (out[3], ref[3], "depth")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=name)


def test_vjp_pallas_forward_grads(rng):
    """custom_vjp with the Pallas primal (vjp_pallas_forward): value ==
    jnp-scan primal and gradients == autodiff through the scan."""
    import dataclasses
    from langsplat4d.render import composite_vjp as CV
    H = W = 32
    cam = make_camera(H, W)
    settings = R.RasterSettings(
        H, W, sh_degree=0, lang_dim=3, include_feature=True,
        tile_capacity=64, composite_chunk=32, bin_tile_chunk=8,
        composite_tile_chunk=4, pallas_tile_block=2, bin_cell_tiles=2,
        cell_capacity=128, band_capacity=128, tile_row_capacity=64)
    n = 60
    means, scales, quats, opac, colors, lang = random_scene(rng, n=n)
    prep = jax.jit(lambda mn, dm, op, sc, qt, cl: R.preprocess(
        settings, cam, mn, dm, op, sc, qt, None, cl))(
        jnp.asarray(means), jnp.zeros((n, 2)), jnp.asarray(opac),
        jnp.asarray(scales), jnp.asarray(quats), jnp.asarray(colors))
    prep = jax.tree.map(jnp.asarray, jax.device_get(prep))
    entries, valid = jax.jit(lambda p: R.bin_tiles(settings, p))(prep)
    packed = jnp.concatenate(
        [prep["point_image"], prep["conic"], prep["opacity"][:, None],
         prep["colors"], jnp.asarray(lang), prep["depth"][:, None]], axis=1)
    bg = jnp.asarray([0.2, 0.5, 0.7])
    tgt = jnp.asarray(rng.normal(size=(settings.num_tiles, 8, 256)),
                      jnp.float32)

    pal = dataclasses.replace(settings, vjp_pallas_forward=True,
                              vjp_pallas_backward=True)

    def loss_pal(d, b):
        return jnp.sum(CV.composite_cv(pal, d, entries, valid, b) * tgt)

    def loss_ref(d, b):
        return jnp.sum(CV.composite_forward(settings, d, entries, valid, b)
                       * tgt)

    v_pal = loss_pal(packed, bg)
    v_ref = loss_ref(packed, bg)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-4)
    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(packed, bg)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(packed, bg)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_ref[1]),
                               rtol=2e-3, atol=2e-4)
