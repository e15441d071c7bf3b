"""Run the REFERENCE's own evaluation pipeline end-to-end and return its
(precision, mIoU) — the decisive parity oracle for our `--domain_shift` mode.

This imports and executes the reference's actual code from /root/reference
(train.py:24-61 `val()`, dataset/cityscapes.py:12-74 `CityScapes`,
utils.py:98-172 metric helpers, model/model_stages.py BiSeNet), so the
WHOLE pipeline — directory scan -> sorted pairing -> PIL decode ->
(transposed) resize -> ToTensor+ImageNet-normalize -> forward ->
reverse_one_hot -> fast_hist/per_class_iu/compute_global_accuracy — is the
reference's, bit for bit.  Our CLI run over the same tree + checkpoint must
then produce the SAME number (tests/test_eval_parity.py asserts it; on real
Cityscapes data use the __main__ entry per PARITY_RUNBOOK.md).

Environment shims (import-surface only, no behavioral stubs of code under
test):
* torchvision is absent in this image; the reference dataset uses only
  `transforms.Compose/ToTensor/Normalize/PILToTensor`, whose semantics are
  pinned by torchvision's docs — a faithful ~40-line stand-in is installed
  iff the real torchvision cannot be imported.
* `.cuda()` calls (reference train.py:32-33 etc.) are made no-ops so the
  loop runs on CPU torch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")


def _install_torchvision_stub():
    """Install a minimal, semantics-exact torchvision.transforms iff the
    real one is unavailable.  Covers exactly what the reference datasets
    import (cityscapes.py:8, GTAV.py:9): Compose, ToTensor, Normalize,
    PILToTensor (+ the aug classes GTAV references at construction time,
    which eval never constructs, so they may raise if used)."""
    try:
        import torchvision  # noqa: F401

        return
    except Exception:
        pass

    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class ToTensor:
        """torchvision.transforms.functional.to_tensor: PIL HWC uint8 ->
        float32 CHW in [0,1]."""

        def __call__(self, pic):
            arr = np.array(pic, copy=True)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
            return t.to(torch.float32).div(255)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    class PILToTensor:
        """uint8 CHW, no scaling; 'L'/'P' -> (1,H,W)."""

        def __call__(self, pic):
            arr = np.array(pic, copy=True)
            t = torch.as_tensor(arr)
            t = t.view(pic.size[1], pic.size[0], len(pic.getbands()))
            return t.permute(2, 0, 1).contiguous()

    class _Unavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "torchvision stub: augmentation transforms are not "
                "implemented (eval never constructs them)")

    for name, cls in [("Compose", Compose), ("ToTensor", ToTensor),
                      ("Normalize", Normalize),
                      ("PILToTensor", PILToTensor)]:
        setattr(tr, name, cls)
    for name in ("ColorJitter", "RandomApply", "RandomHorizontalFlip",
                 "RandomPerspective", "RandomRotation", "Grayscale",
                 "Resize", "RandomCrop"):
        setattr(tr, name, type(name, (_Unavailable,), {}))
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def _patch_cuda_noop():
    """Make .cuda() identity so reference train.py:32-33 runs on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def run_reference_val(root: str, pretrain_path: str, crop_height: int,
                      crop_width: int, num_classes: int = 19,
                      use_conv_last: bool = False):
    """Execute reference val() (train.py:24-61) over CityScapes('val', root)
    with a BiSeNet loaded from `pretrain_path`. Returns (precision, miou).
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_torchvision_stub()
    _patch_cuda_noop()

    from torch.utils.data import DataLoader

    import train as ref_train  # /root/reference/train.py
    from dataset.cityscapes import CityScapes as RefCityScapes
    from model.model_stages import BiSeNet as RefBiSeNet

    dataset = RefCityScapes("val", root, crop_height, crop_width)
    loader = DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
    model = RefBiSeNet(backbone="STDCNet813", n_classes=num_classes,
                       pretrain_model=pretrain_path,
                       use_conv_last=use_conv_last)
    args = argparse.Namespace(num_classes=num_classes)
    precision, miou = ref_train.val(args, model, loader)
    return float(precision), float(miou)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--pretrain_path", required=True)
    p.add_argument("--crop_height", type=int, default=512)
    p.add_argument("--crop_width", type=int, default=1024)
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--use_conv_last", action="store_true")
    a = p.parse_args(argv)
    precision, miou = run_reference_val(
        a.root, a.pretrain_path, a.crop_height, a.crop_width,
        a.num_classes, a.use_conv_last)
    print(json.dumps({"precision": precision, "miou": miou}))


if __name__ == "__main__":
    main()
