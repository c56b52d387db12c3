"""Compact H2D batch wire format (train/step.py materialize_batch,
train/loop.py build_batch compact path): the on-device decode/gather must
reproduce the full-format batches value-for-value, so both formats feed the
step identical training signals (reference semantics: train.py:242-296 +
scene/cameras.py:92-118)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from langsplat4d.config import Config
from langsplat4d.train.step import Batch, materialize_batch
from tests.scene_fixture import make_nerfies_scene


@pytest.fixture(scope="module")
def nerfies_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("compact_scene")
    return make_nerfies_scene(str(root / "nerfies"), n_imgs=8, hw=64,
                              n_points=80)


def _scene_and_cfg(nerfies_root):
    from langsplat4d.data.scene import Scene
    cfg = Config()
    cfg.model.source_path = nerfies_root
    cfg.model.model_path = ""
    cfg.model.language_features_name = "language_features"
    cfg.model.feature_level = 1
    scene = Scene(nerfies_root)
    return scene, cfg


def test_materialize_uint8_images_is_exact():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, 3, 16, 16), dtype=np.uint8)
    b = Batch(cams=None, times=jnp.zeros(2),
              gt_images=jnp.asarray(u8), gt_lang=None, lang_mask=None)
    out = materialize_batch(b)
    np.testing.assert_array_equal(
        np.asarray(out.gt_images),
        u8.astype(np.float32) / np.float32(255.0))


def test_materialize_seg_table_matches_host_gather():
    rng = np.random.default_rng(1)
    h = w = 32
    n_seg, lang_dim = 7, 3
    seg = rng.integers(-1, n_seg, size=(h, w)).astype(np.int16)
    table = rng.normal(size=(n_seg, lang_dim)).astype(np.float32)

    from langsplat4d import native
    full_f, full_m = native.gather_language_features(
        seg.astype(np.int32), table)

    # pad the table like build_batch does (zeros rows are never selected)
    t_pad = np.pad(table, ((0, 64 - n_seg), (0, 0)))
    b = Batch(cams=None, times=jnp.zeros(1),
              gt_images=jnp.zeros((1, 3, h, w), jnp.uint8),
              gt_lang=None, lang_mask=None,
              gt_seg=jnp.asarray(seg[None]),
              gt_tables=jnp.asarray(t_pad[None]))
    out = materialize_batch(b)
    np.testing.assert_array_equal(np.asarray(out.lang_mask[0, 0]),
                                  full_m[0].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(out.gt_lang[0]),
                                  full_f * full_m.astype(np.float32))


def test_build_batch_compact_equals_full(nerfies_root):
    from langsplat4d.train.loop import build_batch
    scene, cfg = _scene_and_cfg(nerfies_root)
    cams = [scene.getTrainCameras()[i] for i in (0, 1)]

    cfg.runtime.compact_batch = False
    full = build_batch(cams, cfg, scene, "train")
    assert full.gt_images.dtype == jnp.float32
    assert full.gt_seg is None

    cfg.runtime.compact_batch = True
    compact = build_batch(cams, cfg, scene, "train")
    assert compact.gt_images.dtype == jnp.uint8   # u8 PNGs -> lossless
    assert compact.gt_lang is None and compact.gt_seg is not None

    dec = materialize_batch(compact)
    np.testing.assert_array_equal(np.asarray(dec.gt_images),
                                  np.asarray(full.gt_images))
    np.testing.assert_array_equal(np.asarray(dec.lang_mask),
                                  np.asarray(full.lang_mask))
    np.testing.assert_array_equal(
        np.asarray(dec.gt_lang),
        np.asarray(full.gt_lang) * np.asarray(full.lang_mask))


def test_build_batch_base_stage_skips_lang(nerfies_root):
    from langsplat4d.train.loop import build_batch
    scene, cfg = _scene_and_cfg(nerfies_root)
    cams = [scene.getTrainCameras()[0]]
    b = build_batch(cams, cfg, scene, "train", need_lang=False)
    assert b.gt_lang is None and b.gt_seg is None and b.lang_mask is None
    # the materialized base batch still decodes images
    dec = materialize_batch(b)
    assert dec.gt_images.dtype == jnp.float32
    assert float(dec.gt_images.max()) <= 1.0


def test_gt_cache_serves_identical_batches(nerfies_root):
    """Second build of the same cameras must hit the device cache and return
    value-identical batches (the cache is a pure H2D amortization)."""
    from langsplat4d.data import gt_cache
    from langsplat4d.train.loop import build_batch
    scene, cfg = _scene_and_cfg(nerfies_root)
    cfg.runtime.gt_cache_mb = 64
    cache = gt_cache.get_cache(64)
    cache.clear()
    cams = [scene.getTrainCameras()[i] for i in (0, 1)]
    b1 = build_batch(cams, cfg, scene, "train")
    h0, m0 = cache.hits, cache.misses
    assert m0 >= 4 and cache.bytes > 0
    # CameraDataset re-materializes cameras per access — same content
    cams2 = [scene.getTrainCameras()[i] for i in (0, 1)]
    b2 = build_batch(cams2, cfg, scene, "train")
    assert cache.hits >= h0 + 4 and cache.misses == m0
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gt_cache_fingerprint_misses_on_mutation(nerfies_root):
    """A host-side image edit must not be served stale cached bytes."""
    from langsplat4d.data import gt_cache
    from langsplat4d.train.loop import build_batch
    scene, cfg = _scene_and_cfg(nerfies_root)
    cfg.runtime.gt_cache_mb = 64
    gt_cache.get_cache(64).clear()
    cam = scene.getTrainCameras()[0]
    b1 = build_batch([cam], cfg, scene, "train", need_lang=False)
    cam2 = scene.getTrainCameras()[0]
    cam2.image = np.clip(cam2.image + np.float32(0.25), 0, 1)
    b2 = build_batch([cam2], cfg, scene, "train", need_lang=False)
    assert not np.array_equal(
        np.asarray(materialize_batch(b1).gt_images),
        np.asarray(materialize_batch(b2).gt_images))


def test_gt_cache_budget_evicts_fifo():
    from langsplat4d.data.gt_cache import DeviceGTCache
    c = DeviceGTCache(budget_bytes=3 * 1024)
    a = np.zeros(256, np.float32)          # 1 KB each
    for k in range(5):
        c.put(("k", k), (a,))
    assert c.bytes <= 3 * 1024
    assert c.peek(("k", 0)) is None        # evicted
    assert c.peek(("k", 4)) is not None    # newest survives
    big = np.zeros(4096, np.float32)       # > budget: returned uncached
    out = c.put(("big",), (big,))
    assert out[0].shape == (4096,) and c.peek(("big",)) is None


def test_build_batch_float_images_stay_f32(nerfies_root):
    """Images that are NOT a u8 round-trip must not be quantized."""
    from langsplat4d.train.loop import build_batch
    scene, cfg = _scene_and_cfg(nerfies_root)
    cam = scene.getTrainCameras()[0]
    cam.image = cam.image + np.float32(1e-4)   # no longer k/255 values
    b = build_batch([cam], cfg, scene, "train", need_lang=False)
    assert b.gt_images.dtype == jnp.float32


def test_packed_payload_matches_batch(nerfies_root):
    """build_batch(packed_iter=i) -> PackedPayload whose payload_to_batch
    reconstruction materializes to the same arrays as the legacy Batch
    (camera rows, images, seg/table gather)."""
    from langsplat4d.train.loop import (PackedPayload, build_batch,
                                        payload_to_batch)
    scene, cfg = _scene_and_cfg(nerfies_root)
    cams = [scene.getTrainCameras()[i] for i in (0, 1)]

    legacy = build_batch(cams, cfg, scene, "train")
    payload = build_batch(cams, cfg, scene, "train", packed_iter=7)
    assert isinstance(payload, PackedPayload)
    assert payload.packed.shape[1] == 39
    assert float(payload.packed[0, 38]) == 7.0    # iteration column

    rec = payload_to_batch(payload)
    for k in ("viewmatrix", "projmatrix", "campos", "tanfovx", "tanfovy"):
        np.testing.assert_allclose(
            np.asarray(getattr(rec.cams, k)),
            np.asarray(getattr(legacy.cams, k)), rtol=0, atol=0, err_msg=k)
    np.testing.assert_array_equal(np.asarray(rec.times),
                                  np.asarray(legacy.times))
    dec_r, dec_l = materialize_batch(rec), materialize_batch(legacy)
    np.testing.assert_array_equal(np.asarray(dec_r.gt_images),
                                  np.asarray(dec_l.gt_images))
    np.testing.assert_array_equal(np.asarray(dec_r.gt_lang),
                                  np.asarray(dec_l.gt_lang))
    np.testing.assert_array_equal(np.asarray(dec_r.lang_mask),
                                  np.asarray(dec_l.lang_mask))


def test_packed_step_matches_legacy_step(nerfies_root):
    """train_step_packed must produce the same updated params and loss as
    train_step on the equivalent legacy Batch (the single-dispatch path is
    a wire-format change, not a numerics change)."""
    from langsplat4d.render.raster import RasterSettings
    from langsplat4d.train.loop import build_batch
    from langsplat4d.train.optim import LRConfig
    from langsplat4d.train.step import StepConfig, train_step, \
        train_step_packed
    from langsplat4d.config import OptimizationConfig
    from tests.test_train import tiny_state

    scene, cfg = _scene_and_cfg(nerfies_root)
    cams = [scene.getTrainCameras()[0]]
    rng = np.random.default_rng(3)
    state, dcfg = tiny_state(rng, n=32, cap=32)
    H, W = cams[0].height, cams[0].width
    settings = RasterSettings(H, W, sh_degree=0, lang_dim=3,
                              include_feature=True, tile_capacity=32,
                              composite_chunk=16, composite_tile_chunk=4)
    step_cfg = StepConfig(
        settings=settings, dcfg=dcfg,
        lr_cfg=LRConfig.from_optim(OptimizationConfig(), 1.0),
        stage="fine-lang", no_dlang=False)
    bg = jnp.zeros(3)

    legacy = build_batch(cams, cfg, scene, "train")
    payload = build_batch(cams, cfg, scene, "train", packed_iter=5)

    s_ref, m_ref, vs_ref, vis_ref, rad_ref = train_step(
        step_cfg, state, legacy, bg, jnp.asarray(5, jnp.int32), 0)
    s_pk, m_pk, vs_pk, vis_pk, rad_pk = train_step_packed(
        step_cfg, state, jnp.asarray(payload.packed), payload.imgs,
        payload.segs, payload.tables, bg, 0)

    np.testing.assert_allclose(float(m_pk["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for k in ("xyz", "opacity", "scaling", "language_feature"):
        np.testing.assert_allclose(np.asarray(s_pk.params[k]),
                                   np.asarray(s_ref.params[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(np.asarray(vs_pk), np.asarray(vs_ref),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(vis_pk), np.asarray(vis_ref))
    np.testing.assert_allclose(np.asarray(rad_pk), np.asarray(rad_ref),
                               rtol=1e-5, atol=1e-5)
