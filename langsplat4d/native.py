"""ctypes bindings to the native host-pipeline library (native/fastio.cpp).

Compiled on first use; every entry point has a numpy fallback so the
framework runs without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import sys
        sys.path.insert(0, os.path.join(here, "native"))
        from build import build  # type: ignore
        lib = ctypes.CDLL(build())
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        up = ctypes.POINTER(ctypes.c_uint8)
        hp = ctypes.POINTER(ctypes.c_uint16)
        lib.gather_language_features.argtypes = [ip, fp, i64, i64, i64, fp, up]
        lib.gather_language_features_f16.argtypes = [ip, hp, i64, i64, i64,
                                                     fp, up]
        lib.image_u8_to_chw_f32.argtypes = [up, i64, i64, i64, fp]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


_IMG = None
_IMG_TRIED = False


def _load_img():
    global _IMG, _IMG_TRIED
    if _IMG_TRIED:
        return _IMG
    _IMG_TRIED = True
    try:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import sys
        sys.path.insert(0, os.path.join(here, "native"))
        from build import build_imgcodec  # type: ignore
        lib = ctypes.CDLL(build_imgcodec())
        ci = ctypes.c_int
        cip = ctypes.POINTER(ci)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.img_header.argtypes = [ctypes.c_char_p, cip, cip, cip]
        lib.img_header.restype = ci
        lib.img_load_chw_f32.argtypes = [ctypes.c_char_p, ci, ci, ci, fp]
        lib.img_load_chw_f32.restype = ci
        _IMG = lib
    except Exception:
        _IMG = None
    return _IMG


def available() -> bool:
    return _load() is not None


def imgcodec_available() -> bool:
    return _load_img() is not None


_FILTERS = {"box": 0, "bilinear": 1, "bicubic": 2, "lanczos": 3}


def load_image_chw(path: str, resize=None, filt: str = "bicubic"):
    """Native PNG/JPEG decode (+ PIL-style antialiased resize) straight to
    [C,H,W] float32 in [0,1], GIL-free (native/imgcodec.cpp).

    `resize` is (width, height) like PIL. Returns None when the codec
    library or the file's format isn't supported — callers fall back to PIL.
    """
    lib = _load_img()
    if lib is None:
        return None
    w, h, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    p = os.fspath(path).encode()
    if lib.img_header(p, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)):
        return None
    ow, oh = resize if resize is not None else (w.value, h.value)
    out = np.empty((c.value, int(oh), int(ow)), np.float32)
    rc = lib.img_load_chw_f32(
        p, int(ow), int(oh), _FILTERS[filt],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return None if rc else out


def gather_language_features(seg: np.ndarray, feats: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """seg [H,W] int32 (-1 bg), feats [S,C] -> (out [C,H,W] f32,
    mask [1,H,W] bool)."""
    h, w = seg.shape
    lib = _load()
    seg = np.ascontiguousarray(seg, np.int32)
    if lib is not None and feats.dtype in (np.float32, np.float16):
        out = np.empty((feats.shape[1], h * w), np.float32)
        mask = np.empty(h * w, np.uint8)
        segp = seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        outp = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        maskp = mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if feats.dtype == np.float16:
            f = np.ascontiguousarray(feats)
            lib.gather_language_features_f16(
                segp, f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                h * w, feats.shape[0], feats.shape[1], outp, maskp)
        else:
            f = np.ascontiguousarray(feats, np.float32)
            lib.gather_language_features(
                segp, f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                h * w, feats.shape[0], feats.shape[1], outp, maskp)
        return (out.reshape(feats.shape[1], h, w),
                mask.reshape(1, h, w).astype(bool))
    # numpy fallback
    mask = (seg != -1)[None]
    feat = feats[np.clip(seg, 0, None)].astype(np.float32)
    feat = np.where(mask[0][..., None], feat, 0.0)
    return np.transpose(feat, (2, 0, 1)), mask


def image_u8_to_chw_f32(img: np.ndarray) -> np.ndarray:
    """[H,W,C] uint8 -> [C,H,W] float32 in [0,1]."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is not None:
        out = np.empty((c, h * w), np.float32)
        lib.image_u8_to_chw_f32(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out.reshape(c, h, w)
    return np.transpose(img.astype(np.float32) / 255.0, (2, 0, 1))
