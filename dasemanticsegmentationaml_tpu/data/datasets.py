"""Dataset index scanners + sample loading.

Reproduces the reference's file discovery and pairing rules:

* ``CityScapes``: scans ``<root>/images/<mode>/<city>/*`` and
  ``<root>/gtFine/<mode>/<city>/*`` (skipping files whose name contains
  'color'), pairs image/label by independent sorted order
  (reference cityscapes.py:38-59).
* ``GtaV``: flat ``<root>/images`` + ``<root>/labels`` sorted pairing
  (reference GTAV.py:65-79); labels carry raw GTA ids remapped to trainIds
  on device via the 256-entry LUT (data/labels.py) instead of the
  reference's 36-pass loop (GTAV.py:97-100).
* ``train_val_split``: the reference's sklearn 75/25 split with
  ``random_state=42, shuffle=True`` (reference train.py:458).

Samples are returned as uint8 arrays (image HWC, label HW); augmentation +
normalization + remap happen on device (data/pipeline.py).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .transforms_host import load_image, load_label

_IMG_EXTS = (".png", ".jpg", ".jpeg")


class _PairDataset:
    """Base: list of (image_path, label_path) + resize config."""

    def __init__(self, pairs, height: int, width: int,
                 faithful_resize: bool = True):
        self.pairs: List[Tuple[str, str]] = list(pairs)
        self.height = height
        self.width = width
        self.faithful_resize = faithful_resize

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        image_path, label_path = self.pairs[idx]
        image = load_image(image_path, (self.height, self.width),
                           self.faithful_resize)
        label = load_label(label_path, (self.height, self.width),
                           self.faithful_resize)
        return image, label

    @property
    def needs_remap(self) -> bool:
        return False


class CityScapes(_PairDataset):
    """reference cityscapes.py:12-74. Labels are assumed trainId-encoded
    already (no remap), matching the reference."""

    def __init__(self, mode: str, root: str, height: int, width: int,
                 faithful_resize: bool = True):
        root = os.path.normpath(root)
        image_dir = os.path.join(root, "images", mode)
        label_dir = os.path.join(root, "gtFine", mode)
        for d in (image_dir, label_dir):
            if not os.path.isdir(d):
                raise FileNotFoundError(
                    f"CityScapes {mode}: expected directory {d!r} "
                    "(layout: <root>/images/<mode>/<city>/*.png + "
                    "<root>/gtFine/<mode>/<city>/*labelTrainIds.png)")

        images, labels = [], []
        for city in sorted(os.listdir(image_dir)):
            folder = os.path.join(image_dir, city)
            if not os.path.isdir(folder):
                continue
            for filename in os.listdir(folder):
                if filename.lower().endswith(_IMG_EXTS):
                    images.append(os.path.join(folder, filename))
        for city in sorted(os.listdir(label_dir)):
            folder = os.path.join(label_dir, city)
            if not os.path.isdir(folder):
                continue
            for filename in os.listdir(folder):
                if (filename.lower().endswith(_IMG_EXTS)
                        and "color" not in filename.lower()):
                    labels.append(os.path.join(folder, filename))

        pairs = list(zip(sorted(images), sorted(labels)))
        if len(images) != len(labels):
            raise ValueError(
                f"CityScapes {mode}: {len(images)} images vs "
                f"{len(labels)} labels")
        super().__init__(pairs, height, width, faithful_resize)
        self.mode = mode


class GtaV(_PairDataset):
    """reference GTAV.py:13-100. ``aug_type`` names the on-device
    augmentation family applied by the pipeline (None|CS-HF|H-RP|B-GS-R)."""

    def __init__(self, root: str, aug_type: Optional[str], height: int,
                 width: int, faithful_resize: bool = True):
        root = os.path.normpath(root)
        image_dir = os.path.join(root, "images")
        label_dir = os.path.join(root, "labels")
        for d in (image_dir, label_dir):
            if not os.path.isdir(d):
                raise FileNotFoundError(
                    f"GtaV: expected directory {d!r} "
                    "(layout: <root>/images/*.png + <root>/labels/*.png)")
        images = sorted(
            os.path.join(image_dir, f) for f in os.listdir(image_dir)
        )
        labels = sorted(
            os.path.join(label_dir, f) for f in os.listdir(label_dir)
        )
        if len(images) != len(labels):
            raise ValueError(
                f"GtaV: {len(images)} images vs {len(labels)} labels")
        super().__init__(list(zip(images, labels)), height, width,
                         faithful_resize)
        if aug_type not in (None, "CS-HF", "H-RP", "B-GS-R"):
            raise KeyError(aug_type)
        self.aug_type = aug_type

    @property
    def needs_remap(self) -> bool:
        return True


class Subset:
    """View over a dataset by index list (torch.utils.data.Subset analogue,
    reference train.py:462-463)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[self.indices[idx]]

    def __getattr__(self, name):
        return getattr(self.dataset, name)


def train_val_split(n: int, train_size: float = 0.75, seed: int = 42):
    """Exact reproduction of the reference's
    ``sklearn.train_test_split(range(n), train_size=0.75, random_state=42,
    shuffle=True)`` (reference train.py:458) without the sklearn dependency.

    sklearn's shuffle split is ``RandomState(seed).permutation(n)`` with
    test = the first ``ceil((1-train_size)*n)`` entries and train = the next
    ``floor(train_size*n)`` (sklearn ShuffleSplit._iter_indices semantics).
    tests/test_data.py pins bit-identity against the real sklearn across
    sizes, so a sklearn-less environment trains on the SAME 75/25 split.
    """
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_test = int(math.ceil((1.0 - train_size) * n))
    n_train = int(math.floor(train_size * n))
    return ([int(i) for i in perm[n_test:n_test + n_train]],
            [int(i) for i in perm[:n_test]])


@dataclass
class SyntheticSegDataset:
    """Deterministic in-memory dataset for tests and benchmarks
    (SURVEY.md section 4 test plan: 'deterministic-data tests with a
    synthetic in-memory dataset')."""

    length: int = 16
    height: int = 64
    width: int = 128
    num_classes: int = 19
    seed: int = 0
    raw_gta_ids: bool = False  # emit 0..34 ids that need LUT remap

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        hi = 35 if self.raw_gta_ids else self.num_classes
        self._images = self._rng.integers(
            0, 256, size=(self.length, self.height, self.width, 3),
            dtype=np.uint8)
        self._labels = self._rng.integers(
            0, hi, size=(self.length, self.height, self.width),
            dtype=np.uint8)

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        return self._images[idx], self._labels[idx]

    @property
    def needs_remap(self) -> bool:
        return self.raw_gta_ids

    aug_type: Optional[str] = None
