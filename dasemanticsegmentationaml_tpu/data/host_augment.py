"""Host-side production augmentation (``--host_augment``).

The reference runs every augmentation menu on the HOST, inside its
DataLoader workers (reference dataset/GTAV.py:32-59 builds the
torchvision pipelines; train.py:465-470 fans them across
``num_workers``).  The rebuild's default path runs augmentation on
device (data/augment.py) — great for the gather-free CS-HF menu
(+0.105 ms/img at bs=128), but the two geometric menus are
per-row-LATENCY-bound on the TPU's serial gather engine
(tools/probe_warp.py: H-RP perspective 11.9 ms/img, B-GS-R rotation
8.5 ms/img vs a 1.53 ms/img DA train step — a 6-8x slowdown no XLA
rewrite can fix).  This module restores the reference's deployment
shape for those menus: a dataset wrapper that applies the bit-exact
Pillow reimplementation (data/augment_pil_exact.py) inside the
Loader's decode workers, where a many-core production host absorbs the
cost that the chip cannot.

Determinism: each sample draws its parameters from a fresh
``np.random.Generator`` keyed by ``(seed, epoch, idx)`` — reproducible
across runs, independent of worker scheduling, and advanced per epoch
via the ``set_epoch`` chain (Loader.set_epoch forwards to the dataset).
The parameter DISTRIBUTIONS are torchvision's (RandomApply p=0.5;
ColorJitter uniform ranges; RandomPerspective integer-corner sampling
with its float64-lstsq -> float32 coefficient solve; RandomRotation
uniform angle), but the RNG stream is numpy's, not torch's — the same
realization cannot be obtained from a torch seed, only from (seed,
epoch, idx).  Applied values are bit-identical to torchvision-on-PIL
for CS-HF and B-GS-R and within the measured sub-lsb envelope for
H-RP's bilinear warp (tests/test_augment_parity.py pins both via
augment_pil_exact).

Composes with ``--data_cache``: wrap the CACHED dataset (decode+resize
are cached pre-augmentation; every epoch re-augments the cached pixels),
mirroring the reference's decode-every-epoch pipeline at 20x the decode
throughput.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import augment_pil_exact as ape

IGNORE_FILL = 255


def rng_for(seed: int, epoch: int, idx: int) -> np.random.Generator:
    """Per-sample generator keyed (seed, epoch, idx) — order-independent
    determinism across workers, processes, and re-runs."""
    return np.random.default_rng(
        np.random.SeedSequence((int(seed), int(epoch), int(idx))))


def perspective_coeffs(startpoints, endpoints):
    """torchvision ``_get_perspective_coeffs`` (functional.py): the 8
    homography coefficients mapping OUTPUT (endpoint) space back to
    INPUT (startpoint) space, solved by float64 least squares and cast
    to float32 — the exact dtype path torchvision feeds PIL."""
    a = np.zeros((8, 8), np.float64)
    for i, (p1, p2) in enumerate(zip(endpoints, startpoints)):
        a[2 * i] = [p1[0], p1[1], 1, 0, 0, 0,
                    -p2[0] * p1[0], -p2[0] * p1[1]]
        a[2 * i + 1] = [0, 0, 0, p1[0], p1[1], 1,
                        -p2[1] * p1[0], -p2[1] * p1[1]]
    b = np.asarray(startpoints, np.float64).reshape(8)
    res, *_ = np.linalg.lstsq(a, b, rcond=None)
    return [float(np.float32(v)) for v in res]


def sample_perspective_endpoints(rng: np.random.Generator, h: int, w: int,
                                 distortion: float = 0.5):
    """torchvision RandomPerspective.get_params integer-corner sampling
    (the same bounds as augment.sample_perspective_endpoints, drawn from
    numpy instead of jax.random)."""
    half_h, half_w = h // 2, w // 2
    dh = int(distortion * half_h)
    dw = int(distortion * half_w)
    ri = lambda lo, hi: int(rng.integers(lo, hi))  # noqa: E731
    topleft = (ri(0, dw + 1), ri(0, dh + 1))
    topright = (ri(w - dw - 1, w), ri(0, dh + 1))
    botright = (ri(w - dw - 1, w), ri(h - dh - 1, h))
    botleft = (ri(0, dw + 1), ri(h - dh - 1, h))
    startpoints = [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)]
    endpoints = [topleft, topright, botright, botleft]
    return startpoints, endpoints


def sample_params(aug_type: str, rng: np.random.Generator, h: int, w: int,
                  apply_prob: float = 0.5) -> dict:
    """One sample's augmentation realization for a reference menu
    (dataset/GTAV.py:42-46 wrapped in RandomApply(p=0.5), :51).

    The dict is consumed by augment_pil_exact.apply_family,
    apply_family_label below, AND augment.apply_family_with_params (the
    device twin) — the shared schema is what makes host/device parity
    testable on a single realization."""
    params = {"applied": bool(rng.random() < apply_prob)}
    if not params["applied"]:
        return params
    if aug_type == "CS-HF":
        params["contrast"] = float(rng.uniform(2.0, 5.0))
        params["saturation"] = float(rng.uniform(1.0, 3.0))
    elif aug_type == "H-RP":
        params["hue"] = float(rng.uniform(-0.2, 0.2))
        start, end = sample_perspective_endpoints(rng, h, w, 0.5)
        params["startpoints"], params["endpoints"] = start, end
        params["coeffs"] = perspective_coeffs(start, end)
    elif aug_type == "B-GS-R":
        params["brightness"] = float(rng.uniform(1.0, 2.0))
        params["angle"] = float(rng.uniform(-90.0, 90.0))
    else:
        raise ValueError(f"unknown aug_type {aug_type!r}")
    return params


def warp_nearest_label(label: np.ndarray, coeffs,
                       fill: int = IGNORE_FILL) -> np.ndarray:
    """NEAREST perspective warp of an HW label map on the SAME float64
    source grid as the image's bilinear warp (augment_pil_exact.
    perspective_source_grid): nearest index = floor(s + 0.5), shared
    half-open OOB mask, ignore-fill outside."""
    h, w = label.shape
    sx, sy, oob = ape.perspective_source_grid(h, w, coeffs)
    xi = np.clip(np.floor(sx + 0.5).astype(np.int64), 0, w - 1)
    yi = np.clip(np.floor(sy + 0.5).astype(np.int64), 0, h - 1)
    out = label[yi, xi].copy()
    out[oob] = fill
    return out


def apply_family_label(label: np.ndarray, aug_type: str, params: dict,
                       fill: int = IGNORE_FILL) -> np.ndarray:
    """Mirror a menu's GEOMETRIC ops onto the label (nearest sampling,
    ignore-fill) — the corrected behavior behind --augment_labels. The
    reference leaves labels untransformed (dataset/GTAV.py:87-89;
    SURVEY.md section 4 bug 5), which --augment_labels False preserves."""
    if not params.get("applied", True):
        return label.copy()
    if aug_type == "CS-HF":
        return label[:, ::-1].copy()
    if aug_type == "H-RP":
        return warp_nearest_label(label, params["coeffs"], fill)
    if aug_type == "B-GS-R":
        return ape.rotate_nearest(label, params["angle"], fill=fill)
    raise ValueError(f"unknown aug_type {aug_type!r}")


class HostAugment:
    """Dataset wrapper: apply one reference aug menu on the host, inside
    the Loader's decode workers (the reference's deployment shape,
    dataset/GTAV.py:87 + train.py:465-470).

    Wrap AFTER the decode cache (--data_cache): decode+resize once,
    re-augment every epoch. ``set_epoch`` advances the per-sample RNG
    keys; Loader.set_epoch forwards here."""

    def __init__(self, dataset, aug_type: str, seed: int = 0,
                 augment_labels: bool = False, apply_prob: float = 0.5):
        if aug_type not in ("CS-HF", "H-RP", "B-GS-R"):
            raise KeyError(aug_type)
        self.dataset = dataset
        self.host_aug_type = aug_type
        self.seed = seed
        self.augment_labels = augment_labels
        self.apply_prob = apply_prob
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int):
        from . import native_augment as na

        img, label = self.dataset[idx]
        rng = rng_for(self.seed, self._epoch, idx)
        params = sample_params(self.host_aug_type, rng,
                               img.shape[0], img.shape[1],
                               self.apply_prob)
        # native C++ ops when the library is built (bit-identical,
        # ~5-20x — tests/test_native_augment.py pins equality), numpy
        # otherwise
        out = na.apply_family(img, self.host_aug_type, params)
        img = out if out is not None else ape.apply_family(
            np.ascontiguousarray(img), self.host_aug_type, params)
        if self.augment_labels:
            label = np.asarray(label)
            lout = (na.apply_family_label(label, self.host_aug_type,
                                          params, IGNORE_FILL)
                    if label.dtype == np.uint8 else None)
            label = lout if lout is not None else apply_family_label(
                label, self.host_aug_type, params)
        return img, label

    @property
    def aug_type(self) -> Optional[str]:
        """What the DEVICE pipeline should still apply: nothing — the
        menu ran here. prepare_batch sees aug_type None."""
        return None

    def __getattr__(self, name):
        return getattr(self.dataset, name)
