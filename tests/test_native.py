"""Native C++ decode/resize loader vs PIL oracles.

Skipped when the shared library is not built
(``make -C dasemanticsegmentationaml_tpu/native``).
"""

import numpy as np
import pytest

from dasemanticsegmentationaml_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


@pytest.fixture()
def png_pair(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    lab = rng.integers(0, 35, (37, 53), dtype=np.uint8)
    pi = str(tmp_path / "img.png")
    pl = str(tmp_path / "lab.png")
    Image.fromarray(img).save(pi)
    Image.fromarray(lab, mode="L").save(pl)
    return pi, pl, img, lab


def test_decode_native_size(png_pair):
    pi, pl, img, lab = png_pair
    out = native.decode_resize(pi, None, "bilinear")
    np.testing.assert_array_equal(out, img)
    outl = native.decode_resize(pl, None, "nearest", grayscale=True)
    np.testing.assert_array_equal(outl, lab)


@pytest.mark.parametrize("size", [(24, 16), (100, 80), (53, 37), (64, 90)])
def test_bilinear_exact_vs_pil(png_pair, size):
    """The native resize reproduces Pillow's fixed-point two-pass 8-bit
    resample BIT-EXACTLY (Resample.c semantics: 22-bit int coefficients,
    uint8 intermediate between the horizontal and vertical passes)."""
    from PIL import Image

    pi, _pl, _img, _lab = png_pair
    pil = np.asarray(Image.open(pi).convert("RGB").resize(size,
                                                          Image.BILINEAR))
    nat = native.decode_resize(pi, size, "bilinear")
    np.testing.assert_array_equal(pil, nat)


@pytest.mark.parametrize("size", [(24, 16), (100, 80)])
def test_nearest_labels_exact_vs_pil(png_pair, size):
    from PIL import Image

    _pi, pl, _img, _lab = png_pair
    pn = np.asarray(Image.open(pl).resize(size, Image.NEAREST))
    nn = native.decode_resize(pl, size, "nearest", grayscale=True)
    np.testing.assert_array_equal(pn, nn)


def test_jpeg_decode(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=95)
    pil = np.asarray(Image.open(p).convert("RGB"), np.int16)
    nat = native.decode_resize(p, None, "bilinear")
    assert nat is not None and nat.shape == (32, 48, 3)
    # both use this image's libjpeg with the default IDCT -> bit-equal
    np.testing.assert_array_equal(pil, nat)
