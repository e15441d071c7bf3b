"""Native C++ augmentation ops == the numpy Pillow-exact layer,
bit-for-bit (native/augment.cpp vs data/augment_pil_exact.py).

The numpy layer is pinned against the installed Pillow in
test_augment_parity.py, so equality here closes the chain
native == numpy == Pillow. Skips when the shared library can't build.
"""

import numpy as np
import pytest

from dasemanticsegmentationaml_tpu.data import augment_pil_exact as px
from dasemanticsegmentationaml_tpu.data import host_augment as ha
from dasemanticsegmentationaml_tpu.data import native_augment as na

pytestmark = pytest.mark.skipif(not na.available(),
                                reason="native augment lib unavailable")

MENUS = ("CS-HF", "H-RP", "B-GS-R")


@pytest.fixture()
def rng():
    return np.random.default_rng(17)


def test_native_ops_match_numpy_per_op(rng):
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    for f in (0.3, 1.0, 2.7, 4.999):
        np.testing.assert_array_equal(
            na._blend(img, na._BLEND_BRIGHTNESS, f),
            px.adjust_brightness(img, f), err_msg=f"brightness {f}")
        np.testing.assert_array_equal(
            na._blend(img, na._BLEND_CONTRAST, f),
            px.adjust_contrast(img, f), err_msg=f"contrast {f}")
        np.testing.assert_array_equal(
            na._blend(img, na._BLEND_SATURATION, f),
            px.adjust_saturation(img, f), err_msg=f"saturation {f}")
    lib = na._load()
    np.testing.assert_array_equal(na._call3(lib.dseg_aug_gray3, img),
                                  px.to_grayscale3(img))
    for hf in (-0.5, -0.2, -0.013, 0.0, 0.2, 0.5):
        np.testing.assert_array_equal(
            na._call3(lib.dseg_aug_hue, img, px.hue_shift_u8(hf)),
            px.adjust_hue(img, hf), err_msg=f"hue {hf}")
    for ang in (-90.0, -33.3, 0.0, 17.7, 45.0, 90.0):
        np.testing.assert_array_equal(
            na.rotate_nearest(img, ang, fill=0),
            px.rotate_nearest(img, ang, fill=0), err_msg=f"rot {ang}")
    # full-range hue stress on dense value combos (gray pixels, ties)
    grid = np.stack(np.meshgrid(np.arange(0, 256, 5),
                                np.arange(0, 256, 5),
                                indexing="ij"), -1)
    stress = np.concatenate(
        [grid, np.full(grid.shape[:2] + (1,), 128)], -1).astype(np.uint8)
    assert px.hue_shift_u8(77 / 255) == 77  # factor -> integer shift
    np.testing.assert_array_equal(
        na._call3(lib.dseg_aug_hue, stress, 77),
        px.adjust_hue(stress, 77 / 255))


def test_native_perspective_matches_numpy(rng):
    img = rng.integers(0, 256, (72, 88, 3), dtype=np.uint8)
    lab = rng.integers(0, 35, (72, 88), dtype=np.uint8)
    for i in range(8):
        p = ha.sample_params("H-RP", ha.rng_for(3, 0, i), 72, 88, 1.0)
        np.testing.assert_array_equal(
            na.perspective_bilinear(img, p["coeffs"], fill=0),
            px.perspective_bilinear(img, p["coeffs"], fill=0),
            err_msg=f"warp {i}")
        np.testing.assert_array_equal(
            na.perspective_nearest_label(lab, p["coeffs"], 255),
            ha.warp_nearest_label(lab, p["coeffs"], 255),
            err_msg=f"label warp {i}")


def test_native_apply_family_matches_numpy(rng):
    for menu in MENUS:
        for i in range(6):
            img = rng.integers(0, 256, (56, 72, 3), dtype=np.uint8)
            lab = rng.integers(0, 35, (56, 72), dtype=np.uint8)
            # p=0.5 mix: identity realizations covered too
            p = ha.sample_params(menu, ha.rng_for(5, 1, i), 56, 72)
            np.testing.assert_array_equal(
                na.apply_family(img, menu, p),
                px.apply_family(img, menu, p), err_msg=f"{menu} {i}")
            np.testing.assert_array_equal(
                na.apply_family_label(lab, menu, p, 255),
                ha.apply_family_label(lab, menu, p, 255),
                err_msg=f"{menu} label {i}")


def test_fused_menu_paths_match_unfused_and_numpy(rng, monkeypatch):
    """The round-5 single-pass fusions (dseg_aug_cs_hf_fused,
    dseg_aug_bright_gray1 + 1-channel rotate) must be bit-identical to
    both the per-op native sequence and the numpy Pillow-exact layer."""
    if not na._FUSED:
        pytest.skip("fused symbols not in the built .so")
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    sweeps = {
        "CS-HF": [{"applied": True, "contrast": c, "saturation": s}
                  for c in (2.0, 3.3, 4.999) for s in (1.0, 1.7, 3.0)],
        "B-GS-R": [{"applied": True, "brightness": b, "angle": a}
                   for b in (1.0, 1.5, 2.0) for a in (-90.0, -33.3, 0.0,
                                                      17.7, 90.0)],
    }
    for menu, plist in sweeps.items():
        for p in plist:
            fused = na.apply_family(img, menu, p)
            np.testing.assert_array_equal(
                fused, px.apply_family(img, menu, p),
                err_msg=f"fused-vs-numpy {menu} {p}")
            monkeypatch.setattr(na, "_FUSED", False)
            unfused = na.apply_family(img, menu, p)
            monkeypatch.setattr(na, "_FUSED", True)
            np.testing.assert_array_equal(
                fused, unfused, err_msg=f"fused-vs-unfused {menu} {p}")
            assert fused.flags["C_CONTIGUOUS"]


def test_host_augment_identical_with_and_without_native(monkeypatch):
    from dasemanticsegmentationaml_tpu.data import HostAugment
    from dasemanticsegmentationaml_tpu.data.datasets import (
        SyntheticSegDataset)

    base = SyntheticSegDataset(length=4, height=48, width=64,
                               raw_gta_ids=True)
    ds = HostAugment(base, "B-GS-R", seed=2, augment_labels=True)
    native_out = [ds[i] for i in range(4)]
    monkeypatch.setattr(na, "_AUG", None)
    monkeypatch.setattr(na, "_AUG_TRIED", True)
    numpy_out = [ds[i] for i in range(4)]
    for (ni, nl), (pi, pl) in zip(native_out, numpy_out):
        np.testing.assert_array_equal(ni, pi)
        np.testing.assert_array_equal(nl, pl)
