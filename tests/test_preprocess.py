"""Preprocess pipeline tests: mask/segmap relabeling, feature assembly, and
image-prompt composites — the numpy logic of the offline MLLM stages."""
import csv
import os

import numpy as np
import pytest

from langsplat4d.preprocess import clip_features as CF
from langsplat4d.preprocess import video_features as VF
from langsplat4d.preprocess.image_prompt import (collect_unique_ids,
                                                 highlight_object)


def fake_encoder(dim=512):
    def encode(tiles):
        # deterministic per-tile "embedding" from mean color
        means = tiles.mean(axis=(1, 2, 3), keepdims=False)
        out = np.zeros((len(tiles), dim), np.float32)
        out[:, 0] = means
        out[:, 1] = 1.0
        return out
    return encode


class TestClipFeatures:
    def make_stack(self, h=32, w=32):
        stack = np.zeros((4, h, w), np.int32)
        # level 0: two segments; levels 1-3: one each
        stack[0, :16, :16] = 1
        stack[0, 16:, 16:] = 2
        stack[1, 4:12, 4:28] = 1
        stack[2, :8, :] = 1
        stack[3, :, :8] = 1
        return stack

    def test_masks_from_stack(self):
        levels = CF.masks_from_stack(self.make_stack())
        assert [len(lv) for lv in levels] == [2, 1, 1, 1]
        assert levels[0][0]["bbox"] == [0, 0, 15, 15]

    def test_mask2segmap_ids_and_tiles(self):
        img = np.random.default_rng(0).integers(
            0, 255, size=(32, 32, 3)).astype(np.uint8)
        levels = CF.masks_from_stack(self.make_stack())
        tiles, seg_map = CF.mask2segmap(levels[0], img)
        assert tiles.shape == (2, 3, 224, 224)
        assert seg_map[0, 0] == 0 and seg_map[20, 20] == 1
        assert seg_map[0, 20] == -1

    def test_cross_level_offsets(self):
        img = np.random.default_rng(0).integers(
            0, 255, size=(32, 32, 3)).astype(np.uint8)
        feats, seg_map = CF.create_frame_features(img, self.make_stack(),
                                                  fake_encoder())
        assert feats.shape[0] == 5  # 2+1+1+1 segments
        assert seg_map.shape == (4, 32, 32)
        # level 1's single segment is globally id 2; level 2 -> 3; level 3 -> 4
        assert seg_map[1].max() == 2
        assert seg_map[2].max() == 3
        assert seg_map[3].max() == 4
        assert int(seg_map.max()) + 1 == len(feats)
        # features unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(feats.astype(np.float32), axis=-1), 1.0, atol=1e-3)


class TestVideoFeatures:
    def test_encode_and_assemble(self, tmp_path):
        seg_dir = tmp_path / "segs"
        cap_dir = tmp_path / "caps"
        seg_dir.mkdir()
        cap_dir.mkdir()
        n_frames, max_id = 3, 2
        for i in range(1, n_frames + 1):
            seg = np.zeros((8, 8), np.int32)
            seg[:4] = 1
            seg[4:] = 2
            np.save(seg_dir / f"{i:06}.npy", seg)
        for obj in (1, 2):
            with open(cap_dir / f"output_text_id{obj}.csv", "w",
                      newline="") as f:
                w = csv.writer(f)
                w.writerow(["frame", "cap"])
                for i in range(1, n_frames + 1):
                    w.writerow([f"x/{i:06}.png", f"obj{obj} frame{i}"])

        def encode_text(text):
            out = np.zeros(16)
            out[0] = hash(text) % 100
            return out

        VF.encode_feature(str(cap_dir), "features", str(seg_dir), encode_text,
                          embed_dim=16)
        feats = np.load(cap_dir / "features" / "000001.npy")
        assert feats.shape == (max_id + 1, 16)
        assert feats[0].sum() == 0  # background row untouched

        VF.assemble_final_features(str(cap_dir / "features"), str(seg_dir),
                                   str(tmp_path / "final"))
        f = np.load(tmp_path / "final" / "000001_f.npy")
        s = np.load(tmp_path / "final" / "000001_s.npy")
        assert f.shape == (max_id, 16)      # background dropped
        assert s.shape == (1, 8, 8)
        assert s.min() == 0 and s.max() == 1  # ids shifted to 0-based


class TestImagePrompt:
    def test_highlight_and_ids(self, tmp_path):
        from PIL import Image
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, size=(32, 32, 3)
                                           ).astype(np.uint8))
        mask = np.zeros((32, 32), bool)
        mask[8:24, 8:24] = True
        out = highlight_object(img, mask)
        assert out.size == (32, 32)
        arr = np.asarray(out.convert("RGB"))
        # boundary should contain red pixels
        assert (arr[8, 8:24, 0] > 150).any()

        mdir = tmp_path / "masks"
        mdir.mkdir()
        for i in (1, 2):
            m = np.zeros((8, 8), np.int32)
            m[:4] = i
            np.save(mdir / f"{i:06}.npy", m)
        ids = collect_unique_ids(str(mdir), 2)
        assert ids == {0, 1, 2}


class TestNative:
    def test_native_gather_matches_numpy(self, tmp_path):
        from langsplat4d import native
        rng = np.random.default_rng(0)
        seg = rng.integers(-1, 6, size=(40, 50)).astype(np.int32)
        feats = rng.normal(size=(6, 3)).astype(np.float32)
        out, mask = native.gather_language_features(seg, feats)
        ref_mask = (seg != -1)[None]
        ref = feats[np.clip(seg, 0, None)]
        ref = np.where(ref_mask[0][..., None], ref, 0.0).transpose(2, 0, 1)
        np.testing.assert_allclose(out, ref, atol=1e-6)
        np.testing.assert_array_equal(mask, ref_mask)
        # fp16 path
        out16, mask16 = native.gather_language_features(
            seg, feats.astype(np.float16))
        np.testing.assert_allclose(out16, ref, atol=1e-3)

    def test_image_conversion(self):
        from langsplat4d import native
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(30, 20, 3)).astype(np.uint8)
        out = native.image_u8_to_chw_f32(img)
        ref = np.transpose(img.astype(np.float32) / 255.0, (2, 0, 1))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestMaskNMS:
    """Live-SAM mask NMS (preprocess/mask_nms.py; reference
    generate_clip_features.py:238-317 semantics, vectorized)."""

    def _blob(self, y0, y1, x0, x1, hw=32):
        m = np.zeros((hw, hw), bool)
        m[y0:y1, x0:x1] = True
        return m

    def test_duplicate_suppressed_containment_suppressed(self):
        from langsplat4d.preprocess.mask_nms import mask_nms
        big = self._blob(2, 30, 2, 30)
        dup = self._blob(2, 30, 2, 29)          # IoU ~0.96 with big
        inner = self._blob(10, 20, 10, 20)      # fully inside big
        other = self._blob(0, 8, 24, 32)        # disjoint-ish corner
        masks = np.stack([big, dup, inner, other])
        scores = np.asarray([0.9, 0.8, 0.7, 0.6])
        keep = mask_nms(masks, scores, iou_thr=0.7, score_thr=0.1,
                        inner_thr=0.2)
        assert 0 in keep          # highest-scored survives
        assert 1 not in keep      # near-duplicate suppressed by IoU
        assert 2 not in keep      # contained mask suppressed by inner rule
        assert 3 in keep          # disjoint mask survives

    def test_score_floor_with_top3_fallback(self):
        from langsplat4d.preprocess.mask_nms import mask_nms
        masks = np.stack([self._blob(0, 8, 0, 8), self._blob(10, 18, 10, 18),
                          self._blob(20, 28, 20, 28),
                          self._blob(0, 8, 20, 28)])
        # all below score_thr -> top-3 fallback keeps exactly 3
        keep = mask_nms(masks, np.asarray([0.05, 0.04, 0.03, 0.02]),
                        score_thr=0.1)
        assert len(keep) == 3
        # mixed: only above-threshold masks survive
        keep = mask_nms(masks, np.asarray([0.9, 0.05, 0.8, 0.04]),
                        score_thr=0.1)
        assert set(keep.tolist()) == {0, 2}

    def test_masks_update_levels(self):
        from langsplat4d.preprocess.mask_nms import masks_update
        lvl = [
            {"segmentation": self._blob(2, 30, 2, 30),
             "stability_score": 0.95, "predicted_iou": 0.9},
            {"segmentation": self._blob(2, 30, 2, 29),
             "stability_score": 0.9, "predicted_iou": 0.9},
        ]
        (kept,), = (masks_update(lvl),)
        assert len(kept) == 1
        assert kept[0]["stability_score"] == 0.95
        assert masks_update([])[0] == []
