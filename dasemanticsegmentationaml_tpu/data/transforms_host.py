"""Host-side decode + resize.

The reference's DataLoader workers do: PIL decode -> ``Image.resize`` ->
tensorize (reference cityscapes.py:61-69, GTAV.py:81-90). Two quirks are
reproduced behind flags (SURVEY.md section 4, bug 4):

* ``self.resize = (height, width)`` is passed straight to ``PIL.Image.resize``
  which expects ``(width, height)`` (reference cityscapes.py:22,65-66), so
  with the default 512x1024 config the actual tensors are 1024 tall and 512
  wide. ``faithful_resize=True`` (default) reproduces this; ``False`` gives
  the presumably-intended orientation.
* images use PIL BILINEAR (antialiased triangle filter), labels NEAREST.

Decode itself prefers the native C++ loader (data/native.py) when built and
falls back to PIL. Outputs are uint8 numpy arrays (HWC image / HW label);
normalization and augmentation run on device (data/pipeline.py) to keep
host->HBM transfers at 1 byte/channel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pil_size_for(height: int, width: int, faithful: bool) -> Tuple[int, int]:
    """The (w, h) PIL will actually produce.

    faithful: reference passes (height, width) as PIL's (width, height)
    (reference cityscapes.py:22,65), so output is width=height arg,
    height=width arg.
    """
    if faithful:
        return (height, width)  # PIL (w, h) = (height_arg, width_arg)
    return (width, height)


def load_image(path: str, out_hw: Optional[Tuple[int, int]] = None,
               faithful_resize: bool = True) -> np.ndarray:
    """Decode an RGB image (reference dataset/utils.py:11-14 pil_loader) and
    bilinear-resize. Returns uint8 HWC."""
    from . import native

    if out_hw is not None:
        size = pil_size_for(out_hw[0], out_hw[1], faithful_resize)
    else:
        size = None
    arr = native.decode_resize(path, size, "bilinear")
    if arr is not None:
        return arr
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB")
        if size is not None:
            img = img.resize(size, Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


def load_label(path: str, out_hw: Optional[Tuple[int, int]] = None,
               faithful_resize: bool = True) -> np.ndarray:
    """Decode a label map and nearest-resize. Returns uint8 HW."""
    from . import native

    if out_hw is not None:
        size = pil_size_for(out_hw[0], out_hw[1], faithful_resize)
    else:
        size = None
    arr = native.decode_resize(path, size, "nearest", grayscale=True)
    if arr is not None:
        return arr
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f)
        if img.mode not in ("L", "P", "I"):
            img = img.convert("L")
        if size is not None:
            img = img.resize(size, Image.NEAREST)
        arr = np.asarray(img)
        if arr.ndim == 3:
            arr = arr[..., 0]
        return arr.astype(np.uint8)
