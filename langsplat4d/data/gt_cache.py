"""Device-resident GT cache: upload each camera's training targets once.

The reference rebuilds and re-uploads every iteration's GT tensors
(reference train.py:242-296 — `viewpoint_cam.original_image.cuda()` plus the
per-pixel language-feature gather every single step). On this runtime the
host->device link is the full-loop bottleneck (PERF.md: ~14 MB/camera
full-format measured 0.76 it/s end-to-end vs 23 it/s step-only), but training
revisits each camera `total_iters / n_images` times (~50x on the default
HyperNeRF schedule). The TPU-native design therefore keeps each camera's GT
resident in HBM after its first upload: compact-format GT (uint8 image +
int16 seg ids + feature table, train/step.py Batch) is ~2.5 MB/camera, so a
full HyperNeRF scene (~500 frames) is ~1.2 GB of a 16 GB chip.

FIFO eviction bounds the footprint (`runtime.gt_cache_mb`); scenes larger
than the budget degrade to streaming exactly as before. Image entries carry a
sampled-content fingerprint in their key, so host-side image mutation (e.g.
augmentation or tests patching `cam.image`) misses instead of serving stale
bytes. Language entries are keyed by (feature dir, name, split, level) —
they mirror immutable on-disk `*_s.npy`/`*_f.npy` files, and the dir scopes
them per scene (the cache is process-global; multi-scene processes such as
test suites must not cross-serve entries).
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def image_fingerprint(img: np.ndarray) -> Tuple:
    """Cheap exact-ish content token: shape + hash of a strided sample.

    Any whole-image edit (requantization, augmentation, the test suite's
    `cam.image += 1e-4`) lands in the sample; single-pixel edits off the
    stride lattice can alias, which is acceptable for a GT cache whose
    sources are decoded-from-disk images.
    """
    flat = np.ascontiguousarray(img[..., ::61, ::61])
    return (img.shape, str(img.dtype), hash(flat.tobytes()))


class DeviceGTCache:
    """Byte-budgeted FIFO map key -> tuple of device arrays."""

    def __init__(self, budget_bytes: int):
        self.budget = int(budget_bytes)
        self.bytes = 0
        self.hits = 0
        self.misses = 0
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def peek(self, key) -> Optional[Tuple]:
        with self._lock:
            hit = self._d.get(key)
            if hit is None:
                self.misses += 1
            else:
                self.hits += 1
            return hit

    def put(self, key, host_arrays: Tuple) -> Tuple:
        """Upload `host_arrays` and cache them under `key`.

        Returns the device tuple (the cached one if another thread raced the
        same key). Entries larger than the whole budget are returned
        uncached.
        """
        dev = tuple(jnp.asarray(a) for a in host_arrays)
        nb = sum(int(a.nbytes) for a in dev)
        with self._lock:
            if key in self._d:
                return self._d[key]
            if nb > self.budget:
                return dev
            while self._d and self.bytes + nb > self.budget:
                _, old = self._d.popitem(last=False)
                self.bytes -= sum(int(a.nbytes) for a in old)
            self._d[key] = dev
            self.bytes += nb
            return dev

    def clear(self) -> None:
        with self._lock:
            self._d.clear()
            self.bytes = 0


_CACHE: Optional[DeviceGTCache] = None
_CACHE_MB = 0


def get_cache(budget_mb: int) -> DeviceGTCache:
    """Process-global cache (one training process serves one scene — the
    reference CLI model). Re-budgeting (tests) rebuilds it."""
    global _CACHE, _CACHE_MB
    if _CACHE is None or _CACHE_MB != budget_mb:
        _CACHE = DeviceGTCache(budget_mb * (1 << 20))
        _CACHE_MB = budget_mb
    return _CACHE
