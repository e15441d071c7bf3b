"""Cityscapes/GTA5 label taxonomy and the 34->19 trainId remap.

The reference drives its GTA5 remap from ``dataset/gta5_info.json``
(reference GTAV.py:26-28), which is the standard public Cityscapes label
table (Cityscapes ``labels.py``, ids -1..33 plus GTA5's extra id 34) -- we
generate the same table programmatically rather than shipping a copy.

The reference applies the remap with a 36-pass in-place boolean loop
(reference GTAV.py:97-100); here it is a single 256-entry LUT gather
(uint8 labels -> one ``lut[label]``), which is both correct-by-construction
(no in-place collision ordering) and a single fused device op.
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

# (id, name, trainId, color, category, catId, hasInstances, ignoreInEval)
# Standard Cityscapes label definitions (public dataset spec).
CITYSCAPES_LABELS = [
    (0, "unlabeled", 255, (0, 0, 0), "void", 0, False, True),
    (1, "ego vehicle", 255, (0, 0, 0), "void", 0, False, True),
    (2, "rectification border", 255, (0, 0, 0), "void", 0, False, True),
    (3, "out of roi", 255, (0, 0, 0), "void", 0, False, True),
    (4, "static", 255, (0, 0, 0), "void", 0, False, True),
    (5, "dynamic", 255, (111, 74, 0), "void", 0, False, True),
    (6, "ground", 255, (81, 0, 81), "void", 0, False, True),
    (7, "road", 0, (128, 64, 128), "flat", 1, False, False),
    (8, "sidewalk", 1, (244, 35, 232), "flat", 1, False, False),
    (9, "parking", 255, (250, 170, 160), "flat", 1, False, True),
    (10, "rail track", 255, (230, 150, 140), "flat", 1, False, True),
    (11, "building", 2, (70, 70, 70), "construction", 2, False, False),
    (12, "wall", 3, (102, 102, 156), "construction", 2, False, False),
    (13, "fence", 4, (190, 153, 153), "construction", 2, False, False),
    (14, "guard rail", 255, (180, 165, 180), "construction", 2, False, True),
    (15, "bridge", 255, (150, 100, 100), "construction", 2, False, True),
    (16, "tunnel", 255, (150, 120, 90), "construction", 2, False, True),
    (17, "pole", 5, (153, 153, 153), "object", 3, False, False),
    (18, "polegroup", 255, (153, 153, 153), "object", 3, False, True),
    (19, "traffic light", 6, (250, 170, 30), "object", 3, False, False),
    (20, "traffic sign", 7, (220, 220, 0), "object", 3, False, False),
    (21, "vegetation", 8, (107, 142, 35), "nature", 4, False, False),
    (22, "terrain", 9, (152, 251, 152), "nature", 4, False, False),
    (23, "sky", 10, (70, 130, 180), "sky", 5, False, False),
    (24, "person", 11, (220, 20, 60), "human", 6, True, False),
    (25, "rider", 12, (255, 0, 0), "human", 6, True, False),
    (26, "car", 13, (0, 0, 142), "vehicle", 7, True, False),
    (27, "truck", 14, (0, 0, 70), "vehicle", 7, True, False),
    (28, "bus", 15, (0, 60, 100), "vehicle", 7, True, False),
    (29, "caravan", 255, (0, 0, 90), "vehicle", 7, True, True),
    (30, "trailer", 255, (0, 0, 110), "vehicle", 7, True, True),
    (31, "train", 16, (0, 80, 100), "vehicle", 7, True, False),
    (32, "motorcycle", 17, (0, 0, 230), "vehicle", 7, True, False),
    (33, "bicycle", 18, (119, 11, 32), "vehicle", 7, True, False),
    (34, "unknown", 255, (0, 0, 0), "void", 0, False, True),  # GTA5 extra
    (-1, "license plate", 255, (0, 0, 142), "vehicle", 7, False, True),
]

NUM_TRAIN_CLASSES = 19
IGNORE_LABEL = 255

TRAIN_CLASS_NAMES = [
    name for (_id, name, tid, *_rest) in CITYSCAPES_LABELS if tid != 255
]


def gta5_id_to_train_id() -> Dict[int, int]:
    """{id: trainId} -- equals the reference's ``lb_map`` (GTAV.py:28)."""
    return {lid: tid for (lid, _n, tid, *_r) in CITYSCAPES_LABELS}


def train_id_lut() -> np.ndarray:
    """256-entry uint8 LUT: raw uint8 label id -> trainId (255 = ignore)."""
    lut = np.full(256, IGNORE_LABEL, dtype=np.uint8)
    for lid, _name, tid, *_rest in CITYSCAPES_LABELS:
        if 0 <= lid < 256:
            lut[lid] = tid
    return lut


def remap_train_ids(labels):
    """Jittable raw-id -> trainId remap as a compare/select chain.

    A 256-entry LUT gather (``lut[labels]``) serializes on TPU (measured
    71 ms per 8x512x1024 batch); a vectorized where-chain over the 36
    actual table entries is ~14x faster (5 ms) and exact -- effectively
    the TPU-correct form of the reference's per-id loop (GTAV.py:97-100).
    Entries already mapping to 255 are skipped (the initial fill).
    """
    import jax.numpy as jnp

    lab = labels.astype(jnp.int32)
    out = jnp.full(lab.shape, IGNORE_LABEL, jnp.int32)
    for lid, _name, tid, *_rest in CITYSCAPES_LABELS:
        if 0 <= lid < 256 and tid != IGNORE_LABEL:
            out = jnp.where(lab == lid, tid, out)
    return out


def train_id_colors() -> np.ndarray:
    """(20, 3) uint8 palette for trainIds 0..18 + ignore (black)."""
    colors = np.zeros((NUM_TRAIN_CLASSES + 1, 3), dtype=np.uint8)
    for _lid, _name, tid, color, *_rest in CITYSCAPES_LABELS:
        if tid != 255:
            colors[tid] = color
    return colors


def write_gta5_info_json(path: str) -> None:
    """Emit a gta5_info.json equivalent (CLI/file-format compatibility)."""
    entries: List[dict] = []
    for lid, name, tid, color, cat, catid, has_inst, ignore in \
            CITYSCAPES_LABELS:
        entries.append({
            "hasInstances": has_inst,
            "category": cat,
            "catid": catid,
            "name": name,
            "ignoreInEval": ignore,
            "id": lid,
            "color": list(color),
            "trainId": tid,
        })
    with open(path, "w") as f:
        json.dump(entries, f, indent=2)
