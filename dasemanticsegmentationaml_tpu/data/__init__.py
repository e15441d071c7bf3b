"""Data subsystem: label tables, dataset scanners, host decode, device
transforms/augmentations, prefetching pipeline."""

from .labels import (
    CITYSCAPES_LABELS,
    gta5_id_to_train_id,
    train_id_lut,
    train_id_colors,
    write_gta5_info_json,
)
from .datasets import CityScapes, GtaV, SyntheticSegDataset, train_val_split
from .host_augment import HostAugment
from .pipeline import (Loader, PipelineStallError, prepare_batch,
                       device_prefetch)

__all__ = [
    "CITYSCAPES_LABELS",
    "gta5_id_to_train_id",
    "train_id_lut",
    "train_id_colors",
    "write_gta5_info_json",
    "CityScapes",
    "GtaV",
    "SyntheticSegDataset",
    "train_val_split",
    "HostAugment",
    "Loader",
    "prepare_batch",
    "device_prefetch",
    "PipelineStallError",
]
