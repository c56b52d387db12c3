"""Data-layer tests: COLMAP binary round-trip, scene sniffing, camera math,
samplers, PLY point-cloud IO."""
import json
import os
import struct

import numpy as np
import pytest

from langsplat4d.data import colmap as cm
from langsplat4d.data.cameras import HostCamera, rotate_camera_around_center
from langsplat4d.data.readers import fetch_ply, store_ply
from langsplat4d.data.scene import (BatchLoader, FineSampler,
                                    sniff_dataset_type)


class TestColmap:
    def _write_binary_fixture(self, d):
        # cameras.bin: one PINHOLE camera
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
            f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
        # images.bin: two images
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, name in ((1, b"a.png"), (2, b"b.png")):
                q = np.array([1.0, 0, 0, 0])
                t = np.array([0.1 * i, 0.2, 0.3])
                f.write(struct.pack("<idddddddi", i, *q, *t, 1))
                f.write(name + b"\x00")
                f.write(struct.pack("<Q", 0))
        # points3D.bin: 3 points
        with open(d / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", 3))
            for i in range(3):
                f.write(struct.pack("<QdddBBBd", i, i * 1.0, 2.0, 3.0,
                                    10 * i, 20, 30, 0.5))
                f.write(struct.pack("<Q", 0))

    def test_binary_parsers(self, tmp_path):
        self._write_binary_fixture(tmp_path)
        cams = cm.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 640
        np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

        imgs = cm.read_extrinsics_binary(str(tmp_path / "images.bin"))
        assert len(imgs) == 2
        assert imgs[1].name == "a.png"
        np.testing.assert_allclose(imgs[2].tvec, [0.2, 0.2, 0.3])

        xyz, rgb, err = cm.read_points3D_binary(str(tmp_path / "points3D.bin"))
        assert xyz.shape == (3, 3)
        np.testing.assert_allclose(rgb[:, 0], [0, 10, 20])

    def test_qvec2rotmat_identity(self):
        R = cm.qvec2rotmat(np.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(R, np.eye(3))


class TestSniffing:
    def test_formats(self, tmp_path):
        cases = {
            "colmap": lambda d: os.makedirs(d / "sparse"),
            "blender": lambda d: (d / "transforms_train.json").write_text("{}"),
            "dynerf": lambda d: np.save(d / "poses_bounds.npy", np.zeros(1)),
            "nerfies": lambda d: (d / "dataset.json").write_text("{}"),
            "PanopticSports": lambda d: (d / "train_meta.json").write_text("{}"),
            "MultipleView": lambda d:
                (d / "points3D_multipleview.ply").write_text(""),
        }
        for expected, make in cases.items():
            d = tmp_path / expected
            d.mkdir()
            make(d)
            assert sniff_dataset_type(str(d)) == expected
        with pytest.raises(ValueError):
            sniff_dataset_type(str(tmp_path))


class TestPointCloudPly:
    def test_store_fetch_roundtrip(self, tmp_path, rng):
        xyz = rng.normal(size=(20, 3))
        rgb = rng.uniform(0, 255, size=(20, 3))
        store_ply(str(tmp_path / "p.ply"), xyz, rgb)
        pcd = fetch_ply(str(tmp_path / "p.ply"))
        np.testing.assert_allclose(pcd.points, xyz, atol=1e-5)
        np.testing.assert_allclose(pcd.colors, rgb / 255.0, atol=1e-6)


class TestCameraOrbit:
    def test_orbit_preserves_distance_to_center(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        from langsplat4d.core.transforms import quat_to_rotmat
        import jax.numpy as jnp
        R = np.asarray(quat_to_rotmat(jnp.asarray(q[None]))[0])
        cam = HostCamera(colmap_id=0, R=R, T=rng.normal(size=3), fovx=1.0,
                         fovy=1.0, image=None, image_name="x", uid=0)
        center = np.array([0.5, -0.2, 1.0])
        d0 = np.linalg.norm(cam.camera_center - center)
        out = rotate_camera_around_center(cam, 37.0, center, axs="y")
        d1 = np.linalg.norm(out.camera_center - center)
        np.testing.assert_allclose(d0, d1, rtol=1e-5)
        # orientation stays orthonormal
        np.testing.assert_allclose(out.R @ out.R.T, np.eye(3), atol=1e-6)


class TestSamplers:
    class _FakeDataset:
        def __init__(self, n):
            self.n = n
            self.image_times = [i / n for i in range(n)]

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    def test_fine_sampler_structure(self):
        ds = self._FakeDataset(30)
        s = FineSampler(ds, num_poses=3, seed=0)
        idxs = list(iter(s))
        assert len(idxs) >= 30  # pose permutations + replay injections
        assert min(idxs) >= 0 and max(idxs) < 30
        # each timestamp block permutes all poses at that timestamp
        frame_length = 10
        first_block = idxs[:3]
        assert sorted(i // frame_length for i in first_block
                      if i % frame_length == 0) in ([0, 1, 2], [0, 1], [0])

    def test_batch_loader_shapes(self):
        ds = self._FakeDataset(10)
        batches = list(BatchLoader(ds, 3, seed=1))
        assert sum(len(b) for b in batches) == 10
        assert sorted(sum(batches, [])) == list(range(10))


class TestPrefetch:
    """Host-pipeline prefetch (data/prefetch.py): ordering, laziness bound,
    exception propagation."""

    def test_same_sequence_as_direct_iteration(self):
        from langsplat4d.data.prefetch import prefetch
        items = list(range(57))
        assert list(prefetch(iter(items), depth=3)) == items

    def test_depth_zero_is_synchronous_passthrough(self):
        from langsplat4d.data.prefetch import prefetch
        produced = []

        def gen():
            for i in range(4):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=0)
        assert next(it) == 0
        assert produced == [0]  # nothing ran ahead

    def test_runs_ahead_but_bounded(self):
        import time
        from langsplat4d.data.prefetch import prefetch
        produced = []

        def gen():
            for i in range(100):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=2)
        assert next(it) == 0
        time.sleep(0.2)  # let the producer run ahead
        # ahead by at most depth + the one blocked in q.put
        assert 1 <= len(produced) <= 5

    def test_exception_propagates(self):
        from langsplat4d.data.prefetch import prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        import pytest as _pytest
        with _pytest.raises(ValueError, match="boom"):
            next(it)
