"""Native image codec (native/imgcodec.cpp) vs PIL parity.

The codec replaces the PIL decode+resize hot path of the host data loader
(reference: utils/general_utils.py:21-33 PILtoTorch and the Neu3D half-res
LANCZOS resize, scene/neural_3D_dataset_NDC.py:228-231). Decode and resize
are byte-exact vs PIL: the codec replicates Resample.c's int32 fixed-point
convolution (PRECISION_BITS coefficients, clip8, premultiplied alpha).
"""
import os

import numpy as np
import pytest
from PIL import Image

from langsplat4d import native
from langsplat4d.data.readers import load_image

pytestmark = pytest.mark.skipif(
    not native.imgcodec_available(), reason="imgcodec lib not built")



def _pil_chw(path, resize=None, filt=Image.BICUBIC):
    img = Image.open(path)
    if resize is not None:
        img = img.resize(resize, filt)
    a = np.asarray(img).astype(np.float32) / 255.0
    if a.ndim == 2:
        a = a[..., None]
    return np.transpose(a, (2, 0, 1))


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    out = {}
    rgb = rng.integers(0, 256, (97, 143, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(d / "rgb.png")
    out["rgb.png"] = str(d / "rgb.png")
    Image.fromarray(rgb).save(d / "rgb.jpg", quality=92)
    out["rgb.jpg"] = str(d / "rgb.jpg")
    rgba = rng.integers(0, 256, (64, 80, 4), dtype=np.uint8)
    Image.fromarray(rgba, "RGBA").save(d / "rgba.png")
    out["rgba.png"] = str(d / "rgba.png")
    gray = rng.integers(0, 256, (50, 60), dtype=np.uint8)
    Image.fromarray(gray, "L").save(d / "gray.png")
    out["gray.png"] = str(d / "gray.png")
    # palette PNG exercises png_set_palette_to_rgb
    Image.fromarray(rgb).quantize(64).save(d / "pal.png")
    out["pal.png"] = str(d / "pal.png")
    return out


class TestDecode:
    @pytest.mark.parametrize("name", ["rgb.png", "rgb.jpg", "rgba.png",
                                      "gray.png"])
    def test_decode_exact(self, images, name):
        nat = native.load_image_chw(images[name])
        ref = _pil_chw(images[name])
        assert nat is not None
        assert nat.shape == ref.shape
        np.testing.assert_array_equal(nat, ref)

    def test_palette_png_expands_to_rgb(self, images):
        nat = native.load_image_chw(images["pal.png"])
        ref = _pil_chw(images["pal.png"])
        assert nat is not None
        if ref.shape[0] == 1:  # PIL kept mode P; compare via RGB convert
            ref = np.transpose(
                np.asarray(Image.open(images["pal.png"]).convert("RGB"))
                .astype(np.float32) / 255.0, (2, 0, 1))
        np.testing.assert_array_equal(nat, ref)


class TestResize:
    @pytest.mark.parametrize("filt,pil_filt", [
        ("box", Image.BOX), ("bilinear", Image.BILINEAR),
        ("bicubic", Image.BICUBIC), ("lanczos", Image.LANCZOS)])
    @pytest.mark.parametrize("size", [(71, 40), (200, 150)])
    def test_rgb_byte_exact(self, images, filt, pil_filt, size):
        nat = native.load_image_chw(images["rgb.png"], resize=size,
                                    filt=filt)
        ref = _pil_chw(images["rgb.png"], resize=size, filt=pil_filt)
        assert nat.shape == ref.shape
        np.testing.assert_array_equal(nat, ref)

    def test_rgba_premultiplied_exact(self, images):
        # PIL resizes RGBA via premultiplied "RGBa"; the codec mirrors the
        # MULDIV255 / truncating-unpremultiply arithmetic exactly.
        nat = native.load_image_chw(images["rgba.png"], resize=(40, 32),
                                    filt="lanczos")
        ref = _pil_chw(images["rgba.png"], resize=(40, 32),
                       filt=Image.LANCZOS)
        np.testing.assert_array_equal(nat, ref)

    def test_gray_exact(self, images):
        nat = native.load_image_chw(images["gray.png"], resize=(30, 25),
                                    filt="bilinear")
        ref = _pil_chw(images["gray.png"], resize=(30, 25),
                       filt=Image.BILINEAR)
        np.testing.assert_array_equal(nat, ref)


class TestLoadImageIntegration:
    def test_load_image_uses_native_and_matches_pil(self, images):
        arr = load_image(images["rgb.png"])
        ref = _pil_chw(images["rgb.png"])
        np.testing.assert_array_equal(arr, ref)

    def test_load_image_resize_lanczos(self, images):
        arr = load_image(images["rgb.png"], resize=(70, 50), filt="lanczos")
        ref = _pil_chw(images["rgb.png"], resize=(70, 50),
                       filt=Image.LANCZOS)
        np.testing.assert_array_equal(arr, ref)

    def test_unknown_format_falls_back_to_pil(self, tmp_path):
        # BMP is not handled by the native codec; load_image must still work.
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = tmp_path / "img.bmp"
        Image.fromarray(arr).save(p)
        out = load_image(str(p))
        np.testing.assert_array_equal(out, _pil_chw(str(p)))
