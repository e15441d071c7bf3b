"""Core numeric ops: norms, resizes, losses, metrics, LR schedules."""

from .norm import BatchNorm
from .resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    upsample_nearest,
)
from .losses import (
    cross_entropy_ignore,
    ohem_cross_entropy,
    bce_with_logits,
)
from .metrics import (
    confusion_matrix,
    per_class_iou,
    global_pixel_accuracy,
    global_pixel_accuracy_masked,
)
from .schedules import (poly_lr, PolyLR, adjust_learning_rate,
                        adjust_learning_rate_D)
from .quantize import (collect_calibration, build_quant_collection,
                       quantize_model)

__all__ = [
    "collect_calibration",
    "build_quant_collection",
    "quantize_model",
    "BatchNorm",
    "resize_bilinear_align_corners",
    "resize_nearest",
    "upsample_nearest",
    "cross_entropy_ignore",
    "ohem_cross_entropy",
    "bce_with_logits",
    "confusion_matrix",
    "per_class_iou",
    "global_pixel_accuracy",
    "global_pixel_accuracy_masked",
    "poly_lr",
    "PolyLR",
    "adjust_learning_rate",
    "adjust_learning_rate_D",
]
