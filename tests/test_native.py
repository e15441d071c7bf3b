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


@pytest.fixture()
def palettized_png(tmp_path, rng):
    """A 'P'-mode label PNG where the palette COLOR's luma differs from
    the index, so a palette->RGB->luma decode (the bug class this guards
    against) produces wrong values for every pixel."""
    from PIL import Image

    lab = rng.integers(0, 35, (41, 57), dtype=np.uint8)
    img = Image.fromarray(lab, mode="P")
    # GTA5-style palette: arbitrary bright colors per class id
    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img.putpalette(palette.flatten().tolist())
    p = str(tmp_path / "lab_p.png")
    img.save(p)
    assert Image.open(p).mode == "P"
    return p, lab


def test_palettized_label_indices(palettized_png):
    """Palettized label PNGs (GTA5's format, reference GTAV.py:88) must
    decode to palette INDICES (class ids), exactly like PIL mode 'P' --
    not to luma of the palette colors."""
    p, lab = palettized_png
    nat = native.decode_resize(p, None, "nearest", grayscale=True)
    np.testing.assert_array_equal(nat, lab)


@pytest.mark.parametrize("size", [(24, 16), (100, 80)])
def test_palettized_label_resize_vs_pil(palettized_png, size):
    from PIL import Image

    p, _lab = palettized_png
    pil = np.asarray(Image.open(p).resize(size, Image.NEAREST))
    nat = native.decode_resize(p, size, "nearest", grayscale=True)
    np.testing.assert_array_equal(pil, nat)


def test_palettized_load_label_end_to_end(palettized_png):
    from dasemanticsegmentationaml_tpu.data.transforms_host import load_label

    p, lab = palettized_png
    out = load_label(p, out_hw=None)
    np.testing.assert_array_equal(out, lab)


def test_corrupt_jpeg_returns_none(tmp_path):
    """A fatal libjpeg decode error must return None (PIL fallback), not
    exit() the process (libjpeg's default error_exit)."""
    p = str(tmp_path / "junk.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0not a real jpeg at all" * 3)
    assert native.decode_resize(p, None, "bilinear") is None


def test_truncated_jpeg_survives(tmp_path, rng):
    """Truncation past the header exercises the mid-scanline error path
    (error_exit during jpeg_read_scanlines -> longjmp -> None)."""
    from PIL import Image

    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    whole = tmp_path / "whole.jpg"
    Image.fromarray(img).save(str(whole), quality=95)
    data = whole.read_bytes()
    p = str(tmp_path / "cut.jpg")
    with open(p, "wb") as f:
        f.write(data[: len(data) // 2])
    out = native.decode_resize(p, None, "bilinear")
    # libjpeg may recover a partial image via error-concealment warnings
    # (not fatal) or fail outright; both are fine -- the process survives
    # and the result is either None or a full-shape uint8 array.
    assert out is None or out.shape == (64, 96, 3)


def test_nearest_resize_cumulative_accumulation_parity(tmp_path, rng):
    """Pillow's NEAREST computes source indices by CUMULATIVE double
    addition, not per-pixel (i+0.5)*scale multiplication — at 640->321
    output column 160 the two differ (accumulated sum 319.999.. -> 319
    vs exact center 320.0 -> 320) and whole label columns shift.
    Bit-exact parity with PIL at adversarial geometries."""
    from PIL import Image

    for (sw, sh), (dw, dh) in [((640, 480), (321, 241)),
                               ((640, 4), (333, 3)),
                               ((1999, 7), (777, 5))]:
        lab = rng.integers(0, 35, (sh, sw), dtype=np.uint8)
        p = str(tmp_path / f"l_{sw}x{sh}_{dw}x{dh}.png")
        Image.fromarray(lab, mode="L").save(p)
        want = np.array(Image.fromarray(lab, mode="L").resize(
            (dw, dh), Image.NEAREST))
        nat = native.decode_resize(p, (dw, dh), "nearest", grayscale=True)
        assert nat is not None
        np.testing.assert_array_equal(nat, want, err_msg=f"{sw}x{sh}->"
                                                         f"{dw}x{dh}")


def test_rgba_png_defers_to_pil_conversion(tmp_path):
    """An RGBA image must NOT be decoded natively: libpng's simplified
    API alpha-composites to RGB, while the PIL fallback's convert('RGB')
    drops alpha — PIL's rule is the parity contract, so the native path
    declines and the pipeline result equals PIL's."""
    from PIL import Image

    from dasemanticsegmentationaml_tpu.data.transforms_host import (
        load_image)

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 0], rgba[..., 1], rgba[..., 2], rgba[..., 3] = 200, 100, 50, 128
    p = str(tmp_path / "a.png")
    Image.fromarray(rgba, "RGBA").save(p)
    assert native.decode_resize(p, None, "bilinear") is None
    with open(p, "rb") as fh:
        pil_rgb = np.array(Image.open(fh).convert("RGB"))
    out = load_image(p, None)
    np.testing.assert_array_equal(out, pil_rgb)


def test_huge_header_png_survives(tmp_path):
    """A PNG whose IHDR claims absurd dimensions must return None (PIL
    fallback / catchable error), not throw bad_alloc across the ctypes
    boundary and SIGABRT the process."""
    import struct
    import zlib

    def chunk(typ, payload):
        c = typ + payload
        return (struct.pack(">I", len(payload)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 500000, 500000, 8, 2, 0, 0, 0)
    p = str(tmp_path / "huge.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                + chunk(b"IEND", b""))
    assert native.decode_resize(p, (8, 8), "bilinear") is None
