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

_NNI_STUB = None  # (nni module, nni.experiment module) — see _nni_capture


def _install_torchvision_stub():
    """Install a minimal, semantics-exact torchvision.transforms iff the
    real one is unavailable.  Covers what the reference datasets import
    (cityscapes.py:8, GTAV.py:9): Compose, ToTensor, Normalize,
    PILToTensor, plus the aug classes the GTA5 menus construct — those are
    torchvision_standin's exact reimplementations (identical torch-RNG
    consumption + identical PIL math), so --aug_type train paths execute
    real augmentation."""
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
        """Constructible, raises on USE — kept only for transforms nothing
        in the reference's pipelines ever applies."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError(
                "torchvision stub: transform not implemented")

    # the aug classes the GTA5 menus construct (reference GTAV.py:32-59)
    # come from the semantics-exact stand-in (identical torch-RNG
    # consumption + identical PIL math, see its docstring) so the TRAIN
    # paths run with real augmentation, not a raising placeholder
    _tools_dir = os.path.dirname(os.path.abspath(__file__))
    if _tools_dir not in sys.path:
        sys.path.insert(0, _tools_dir)
    import torchvision_standin as standin

    for name, cls in [("Compose", Compose), ("ToTensor", ToTensor),
                      ("Normalize", Normalize),
                      ("PILToTensor", PILToTensor),
                      ("ColorJitter", standin.ColorJitter),
                      ("RandomApply", standin.RandomApply),
                      ("RandomHorizontalFlip",
                       standin.RandomHorizontalFlip),
                      ("RandomPerspective", standin.RandomPerspective),
                      ("RandomRotation", standin.RandomRotation),
                      ("Grayscale", standin.Grayscale)]:
        setattr(tr, name, cls)
    for name in ("Resize", "RandomCrop"):
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


def run_reference_val_gtav(root: str, pretrain_path: str, crop_height: int,
                           crop_width: int, num_classes: int = 19,
                           use_conv_last: bool = False):
    """Execute reference val() over the GTA5 25% validation split — the
    reference's `--dataset GTAV --domain_shift` pipeline (train.py:
    453-476 split + :519 val): flat dir scan -> sorted pairing ->
    (transposed) PIL resize -> ToTensor+normalize -> 34->19 in-place
    label remap (GTAV.py:97-100) -> forward -> metrics. Returns
    (precision, miou)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_torchvision_stub()
    _patch_cuda_noop()

    from torch.utils.data import DataLoader, Subset

    import train as ref_train  # /root/reference/train.py
    from model.model_stages import BiSeNet as RefBiSeNet

    root = os.path.abspath(root)
    # GtaV reads './dataset/gta5_info.json' relative to CWD (GTAV.py:26)
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        from dataset.GTAV import GtaV as RefGtaV

        dataset = RefGtaV(root, None, crop_height, crop_width)
    finally:
        os.chdir(cwd)

    # the reference's sklearn split (train.py:458); our pinned
    # reproduction is bit-identical (tests/test_data.py) when sklearn
    # is absent from the environment
    try:
        from sklearn.model_selection import train_test_split

        _train_idx, val_idx = train_test_split(
            range(0, len(dataset)), train_size=0.75, random_state=42,
            shuffle=True)
    except ImportError:
        from dasemanticsegmentationaml_tpu.data.datasets import (
            train_val_split,
        )

        _train_idx, val_idx = train_val_split(len(dataset))

    loader = DataLoader(Subset(dataset, val_idx), batch_size=1,
                        shuffle=False, num_workers=0, drop_last=True)
    model = RefBiSeNet(backbone="STDCNet813", n_classes=num_classes,
                       pretrain_model=pretrain_path,
                       use_conv_last=use_conv_last)
    args = argparse.Namespace(num_classes=num_classes)
    precision, miou = ref_train.val(args, model, loader)
    return float(precision), float(miou)


def _aug_seed_for(base_seed: int, idx: int) -> int:
    """Per-sample torch seed shared by the in-run RNG pinning and the
    offline parameter extraction."""
    return (int(base_seed) * 1000003 + int(idx)) % (2 ** 63)


class _PerIndexSeededDataset:
    """RNG-pinning proxy: seeds torch's GLOBAL generator to a function of
    the sample index immediately before delegating to the reference
    dataset's __getitem__, making each sample's augmentation realization
    idx-deterministic (and epoch-constant) — the trick that restores
    shuffle-order invariance for cross-framework trajectory comparison
    (batch_size == dataset size makes batch means permutation-invariant,
    but only if the aug draw doesn't depend on VISIT order). Only the RNG
    state is touched; every line of transform code executed is the
    reference's (GTAV.py:81-90 through the exact torchvision stand-in)."""

    def __init__(self, ds, base_seed: int):
        self.ds = ds
        self.base_seed = base_seed

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        import torch

        torch.manual_seed(_aug_seed_for(self.base_seed, idx))
        return self.ds[idx]

    def __getattr__(self, name):  # .data etc. for any reflective use
        return getattr(self.ds, name)


def build_standin_aug_pipeline(aug_type: str):
    """The aug menu EXACTLY as GtaV composes it (GTAV.py:32-51): the named
    family wrapped in RandomApply(p=0.5), built from the exact stand-in
    classes (identical ctor args, hence identical torch-RNG
    consumption)."""
    import torchvision_standin as standin

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    menus = {
        "CS-HF": _Compose([standin.ColorJitter(contrast=[2, 5]),
                           standin.ColorJitter(saturation=[1, 3]),
                           standin.RandomHorizontalFlip(p=1)]),
        "H-RP": _Compose([standin.ColorJitter(hue=0.2),
                          standin.RandomPerspective(p=1,
                                                    distortion_scale=0.5)]),
        "B-GS-R": _Compose([standin.ColorJitter(brightness=[1, 2]),
                            standin.Grayscale(3),
                            standin.RandomRotation(degrees=90)]),
    }
    return standin.RandomApply([menus[aug_type]], p=0.5)


def extract_aug_params(aug_type: str, n_samples: int, crop_height: int,
                       crop_width: int, base_seed: int):
    """Replay the per-sample torch seeds and return each sample's explicit
    augmentation parameters (list of dicts for augment_pil_exact.
    apply_family / data.augment.apply_family_with_params).

    Runs the stand-in pipeline on a dummy image of the POST-RESIZE PIL
    size — GtaV passes self.resize=(height, width) straight to PIL.resize
    whose argument order is (w, h), so the augmented image is
    (W=crop_height, H=crop_width), the famous transposed-resize quirk
    (GTAV.py:21,85; SURVEY.md section 4 bug 4). Corner randint bounds in
    RandomPerspective depend on that size, so it must match exactly."""
    import torch
    from PIL import Image

    _tools_dir = os.path.dirname(os.path.abspath(__file__))
    if _tools_dir not in sys.path:
        sys.path.insert(0, _tools_dir)
    import torchvision_standin as standin

    dummy = Image.new("RGB", (crop_height, crop_width), (127, 127, 127))
    pipeline = build_standin_aug_pipeline(aug_type)
    out = []
    for idx in range(n_samples):
        torch.manual_seed(_aug_seed_for(base_seed, idx))
        with standin.record() as trace:
            pipeline(dummy)
        out.append(standin.trace_to_params(trace))
    return out


def run_reference_train_supervised(root: str, pretrain_path: str,
                                   crop_height: int, crop_width: int,
                                   num_epochs: int, batch_size: int,
                                   learning_rate: float, workdir: str,
                                   num_classes: int = 19):
    """Execute the reference's ACTUAL supervised trainer (train.py:63-120
    `train()`, wrapped exactly as main() wraps it: DataParallel model,
    SGD(momentum=0.9, weight_decay=1e-4) per train.py:497,504) over a
    Cityscapes tree on CPU torch, then its final val() (train.py:519).

    Returns (per_epoch_mean_losses, final_precision, final_miou).
    Per-epoch losses are parsed from train()'s own
    'loss for train : %f' prints (train.py:103) — the loop exposes them
    no other way. Runs chdir'd into `workdir` because train() writes
    tensorboardX events under ./runs (train.py:64).

    NOTE for callers comparing against our CLI: set batch_size =
    len(train set) (one step per epoch) so torch's shuffled sample ORDER
    is irrelevant — batch-mean losses/gradients and BN batch stats are
    permutation-invariant, so the whole trajectory is comparable without
    sharing an RNG across frameworks.
    """
    import contextlib
    import io
    import re

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_torchvision_stub()
    _patch_cuda_noop()

    import torch
    from torch.utils.data import DataLoader

    import train as ref_train  # /root/reference/train.py
    from dataset.cityscapes import CityScapes as RefCityScapes
    from model.model_stages import BiSeNet as RefBiSeNet

    root = os.path.abspath(root)
    train_ds = RefCityScapes("train", root, crop_height, crop_width)
    val_ds = RefCityScapes("val", root, crop_height, crop_width)
    dl_train = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                          num_workers=0, drop_last=True)
    dl_val = DataLoader(val_ds, batch_size=1, shuffle=False, num_workers=0)
    # DataParallel exactly as main() (train.py:496-497); with no CUDA
    # devices it forwards straight to the module, and train() saves
    # model.module.state_dict() through it (train.py:110,118)
    model = torch.nn.DataParallel(RefBiSeNet(
        backbone="STDCNet813", n_classes=num_classes,
        pretrain_model=pretrain_path, use_conv_last=False))
    optimizer = torch.optim.SGD(model.parameters(), learning_rate,
                                momentum=0.9, weight_decay=1e-4)
    args = argparse.Namespace(
        num_epochs=num_epochs, learning_rate=learning_rate,
        batch_size=batch_size, optimizer="sgd", num_classes=num_classes,
        checkpoint_step=1, validation_step=1,
        save_model_path=os.path.join(workdir, "ref_ckpt"))

    cwd = os.getcwd()
    os.chdir(workdir)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            ref_train.train(args, model, optimizer, dl_train, dl_val)
            precision, miou = ref_train.val(args, model, dl_val)
    finally:
        os.chdir(cwd)
    losses = [float(m) for m in
              re.findall(r"loss for train : ([0-9.eE+-]+)", buf.getvalue())]
    assert len(losses) == num_epochs, buf.getvalue()[-2000:]
    return losses, float(precision), float(miou)


def run_reference_train_da(root_source: str, root_target: str,
                           root_val: str, g_pretrain_path: str,
                           crop_height: int, crop_width: int,
                           num_epochs: int, batch_size: int, workdir: str,
                           learning_rate: float = 0.01,
                           learning_rate_d: float = 1e-3,
                           lambda_adv: float = 1e-3,
                           depthwise: bool = True, batch_norm: bool = True,
                           d_seed: int = 0, num_classes: int = 19,
                           aug_type=None, aug_seed: int = 1234):
    """Execute the reference's ACTUAL adversarial-DA trainer
    (train.py:134-299 train_DA: internal D construction, internal
    GtaV/CityScapes loaders, SGD-G + Adam-D, the 4-phase step) on CPU
    torch, then val() over root_val.

    Returns (d_init_state, per_epoch [(loss_seg, loss_D1)] parsed from
    train_DA's own epoch prints (train.py:278), final_precision,
    final_miou, d_param_count).

    D init sharing: train_DA constructs its discriminator internally
    (train.py:144-152) — the FIRST torch-RNG consumer in the call — so
    seeding torch.manual_seed(d_seed) immediately before both a
    stand-alone construction (to capture the init) and the train_DA call
    reproduces the identical random D. The caller loads `d_init_state`
    into the other framework (our CLI: --d_pretrain_path).

    Comparability: pass batch_size == len(source) == len(target) so each
    epoch is ONE zip'd step and torch's shuffle order is irrelevant.

    aug_type: run the reference with real augmentation (--aug_type) — the
    GtaV source's torchvision pipeline executes through the exact
    stand-in, and the dataset is wrapped in _PerIndexSeededDataset(
    aug_seed) so every sample's realization is idx-deterministic; callers
    recover the identical parameters via extract_aug_params(aug_type, n,
    crop_height, crop_width, aug_seed) and replay them on the JAX side.
    """
    import contextlib
    import io
    import re

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_torchvision_stub()
    _patch_cuda_noop()

    import torch
    from torch.utils.data import DataLoader

    import train as ref_train  # /root/reference/train.py
    from dataset.cityscapes import CityScapes as RefCityScapes
    from model.model_stages import BiSeNet as RefBiSeNet

    root_source = os.path.abspath(root_source)
    root_target = os.path.abspath(root_target)
    root_val = os.path.abspath(root_val)

    # GtaV reads './dataset/gta5_info.json' (GTAV.py:26) and train_DA
    # constructs it internally (train.py:154) — wrap construction in a
    # chdir to the (read-only) reference so nothing else runs there
    orig_gtav = ref_train.GtaV

    def _gtav_in_refdir(root, ds_aug_type, height, width):
        cwd = os.getcwd()
        os.chdir(REFERENCE_ROOT)
        try:
            ds = orig_gtav(root, ds_aug_type, height, width)
        finally:
            os.chdir(cwd)
        if ds_aug_type is not None:
            ds = _PerIndexSeededDataset(ds, aug_seed)
        return ds

    # capture the exact D init train_DA will draw (same seed, same class,
    # same construction order)
    if not depthwise:
        d_cls = ref_train.FCDiscriminator
    elif batch_norm:
        d_cls = ref_train.DepthWiseSepBNFCDiscriminator
    else:
        d_cls = ref_train.DepthWiseSepFCDiscriminator
    torch.manual_seed(d_seed)
    d_init = {k: v.detach().cpu().numpy().copy()
              for k, v in d_cls(num_classes=num_classes)
              .state_dict().items()}

    val_ds = RefCityScapes("val", root_val, crop_height, crop_width)
    dl_val = DataLoader(val_ds, batch_size=1, shuffle=False, num_workers=0)
    model = torch.nn.DataParallel(RefBiSeNet(
        backbone="STDCNet813", n_classes=num_classes,
        pretrain_model=g_pretrain_path, use_conv_last=False))
    args = argparse.Namespace(
        num_epochs=num_epochs, learning_rate=learning_rate,
        learning_rate_D=learning_rate_d, batch_size=batch_size,
        num_workers=0, num_classes=num_classes, optimizer="sgd",
        crop_height=crop_height, crop_width=crop_width,
        momentum=0.9, weight_decay=5e-4,  # reference flag defaults
        lambda_adv_target1=lambda_adv, aug_type=aug_type,
        depthwise=depthwise, batch_norm=batch_norm,
        root_source=root_source, root_target=root_target,
        # checkpoint_step must NOT divide any epoch: train_DA's epoch-
        # checkpoint branch is dead-on-arrival in the reference — 'os'
        # is imported INSIDE the function at train.py:289 (best.pth
        # branch), which makes it function-local, so the earlier
        # os.path.join at :282 raises UnboundLocalError the first time
        # epoch % checkpoint_step == 0 (same bug family as
        # train_nni.py:182, SURVEY.md section 4 item 2). The shipped
        # GTA5_10[_D1].pth cannot have been written by this code as-is.
        checkpoint_step=num_epochs + 99, validation_step=1,
        save_model_path=os.path.join(workdir, "ref_da_ckpt"))
    os.makedirs(args.save_model_path, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(workdir)
    buf = io.StringIO()
    ref_train.GtaV = _gtav_in_refdir
    try:
        torch.manual_seed(d_seed)  # replay the captured D init
        with contextlib.redirect_stdout(buf):
            ref_train.train_DA(args, model, dl_val)
            precision, miou = ref_train.val(args, model, dl_val)
    finally:
        ref_train.GtaV = orig_gtav
        os.chdir(cwd)
    text = buf.getvalue()
    losses = [(float(a), float(b)) for a, b in re.findall(
        r"loss_seg = ([0-9.eE+-]+) loss_D1 = ([0-9.eE+-]+)", text)]
    assert len(losses) == num_epochs, text[-2000:]
    (d_params,) = re.findall(r"The discriminator has:\s+(\d+)", text)
    return d_init, losses, float(precision), float(miou), int(d_params)


def _nni_capture():
    """Capture nni.report_{intermediate,final}_result for the duration of an
    oracle run, in ANY environment (ADVICE r3 items 1-2). Returns
    ``(record, cleanup)`` where record is {'intermediate': [...],
    'final': [...]} and cleanup restores the process state; callers MUST
    invoke cleanup in a ``finally`` that begins BEFORE any other work
    (imports included — train_nni.py:9-10 imports nni at module scope), so
    no exception path can leave the capture installed.

    * real nni importable -> monkeypatch its two report functions (restored
      by cleanup) so the oracle's return contract holds instead of reports
      vanishing into the real package;
    * nni absent -> install a module stub that records the calls (popped by
      cleanup so the rest of the process still sees nni as absent —
      hpo/trial.py probes ``import nni``)."""
    global _NNI_STUB
    try:
        import nni as real_nni

        if not hasattr(real_nni, "_record"):  # genuine package, not our stub
            record = {"intermediate": [], "final": []}
            saved = (real_nni.report_intermediate_result,
                     real_nni.report_final_result)
            real_nni.report_intermediate_result = (
                lambda v: record["intermediate"].append(float(v)))
            real_nni.report_final_result = (
                lambda v: record["final"].append(float(v)))

            def cleanup():
                (real_nni.report_intermediate_result,
                 real_nni.report_final_result) = saved

            return record, cleanup
    except ImportError:
        pass
    if _NNI_STUB is None:
        nni_mod = types.ModuleType("nni")
        nni_mod._record = {"intermediate": [], "final": []}
        nni_mod.get_next_parameter = lambda: {}
        nni_mod.report_intermediate_result = (
            lambda v: nni_mod._record["intermediate"].append(float(v)))
        nni_mod.report_final_result = (
            lambda v: nni_mod._record["final"].append(float(v)))
        exp_mod = types.ModuleType("nni.experiment")

        class Experiment:  # constructed only by experiment_nni.py
            def __init__(self, *a, **k):
                raise RuntimeError("nni stub: Experiment is not runnable")

        exp_mod.Experiment = Experiment
        nni_mod.experiment = exp_mod
        _NNI_STUB = (nni_mod, exp_mod)
    # reuse the SAME stub object every call: a previously-imported
    # train_nni holds a reference to it, so its reports land in this
    # record; reset it and (re)install for the duration of the run —
    # the caller pops it from sys.modules afterwards so the rest of the
    # process still sees nni as absent (hpo/ probes `import nni`)
    _NNI_STUB[0]._record["intermediate"] = []
    _NNI_STUB[0]._record["final"] = []
    sys.modules["nni"] = _NNI_STUB[0]
    sys.modules["nni.experiment"] = _NNI_STUB[1]

    def cleanup():
        sys.modules.pop("nni", None)
        sys.modules.pop("nni.experiment", None)

    return _NNI_STUB[0]._record, cleanup


def run_reference_train_da_nni(root_source: str, root_target: str,
                               root_val: str, g_pretrain_path: str,
                               crop_height: int, crop_width: int,
                               num_epochs: int, batch_size: int,
                               workdir: str, learning_rate: float = 0.01,
                               learning_rate_d: float = 1e-3,
                               lambda_adv: float = 1e-3,
                               weight_decay: float = 5e-4,
                               d_seed: int = 0, num_classes: int = 19):
    """Execute the reference's ACTUAL NNI-trial trainer
    (train_nni.py:58-195 train_DA: always-FCDiscriminator, D consumes the
    out32 head, single zero_grad + four accumulated backwards + one step
    per optimizer, the :97-98 LR dataflow where G follows lr_D's
    compounded poly and D's LR never decays) on CPU torch, then its own
    val() (train_nni.py:19-56) over root_val.

    Returns (d_init_state, per_epoch [(loss_G, loss_adv)] parsed from the
    epoch prints (train_nni.py:178), final_precision, final_miou,
    intermediate_mious reported to nni (train_nni.py:194)).

    Environment shims beyond the eval oracle's (torchvision stand-in,
    .cuda() identity): an `nni` module stub that records report_* calls,
    and ONE minimal crash-bug shim — train_nni.py:71 calls
    ``GtaV('train', root, aug, h, w)`` against the 4-parameter ctor
    (GTAV.py:15), so the module's GtaV symbol is wrapped to drop that
    stray leading 'train' argument (SURVEY.md section 4 bug #1; without
    it the trial path cannot execute at all). The checkpoint branch's
    function-local-``os`` crash (train_nni.py:182 vs :189, bug #2) is
    avoided by a checkpoint_step larger than num_epochs, exactly like
    run_reference_train_da does for train.py's twin bug.

    Comparability contract: same as run_reference_train_da — pass
    batch_size == len(source) == len(target) so each epoch is one zip'd
    step and torch's shuffle order is irrelevant; capture D's init by
    seeding immediately before construction (train_nni.py:68 is the
    first torch-RNG consumer inside train_DA) and hand it to our CLI via
    --d_pretrain_path.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_torchvision_stub()
    _patch_cuda_noop()
    # whole-body finally: any exception below (imports, dataset/model
    # construction, the run itself) must still restore the process's nni
    # state (ADVICE r3 item 1)
    nni_record, nni_cleanup = _nni_capture()
    try:
        return _run_reference_train_da_nni_inner(
            root_source, root_target, root_val, g_pretrain_path,
            crop_height, crop_width, num_epochs, batch_size, workdir,
            learning_rate, learning_rate_d, lambda_adv, weight_decay,
            d_seed, num_classes, nni_record)
    finally:
        nni_cleanup()


def _run_reference_train_da_nni_inner(root_source, root_target, root_val,
                                      g_pretrain_path, crop_height,
                                      crop_width, num_epochs, batch_size,
                                      workdir, learning_rate,
                                      learning_rate_d, lambda_adv,
                                      weight_decay, d_seed, num_classes,
                                      nni_record):
    import contextlib
    import io
    import re

    import torch
    from torch.utils.data import DataLoader

    import train_nni as ref_nni  # /root/reference/train_nni.py
    from dataset.cityscapes import CityScapes as RefCityScapes
    from model.model_stages import BiSeNet as RefBiSeNet

    root_source = os.path.abspath(root_source)
    root_target = os.path.abspath(root_target)
    root_val = os.path.abspath(root_val)

    orig_gtav = ref_nni.GtaV

    def _gtav_arity_shim(_mode, root, aug_type, height, width):
        # drop train_nni.py:71's stray 'train' arg; chdir-wrap for GtaV's
        # CWD-relative './dataset/gta5_info.json' read (GTAV.py:26)
        cwd = os.getcwd()
        os.chdir(REFERENCE_ROOT)
        try:
            return orig_gtav(root, aug_type, height, width)
        finally:
            os.chdir(cwd)

    # capture the exact FCDiscriminator init train_DA will draw
    # (train_nni.py:68 — first RNG consumer; same seed, same class)
    torch.manual_seed(d_seed)
    d_init = {k: v.detach().cpu().numpy().copy()
              for k, v in ref_nni.FCDiscriminator(num_classes=num_classes)
              .state_dict().items()}

    val_ds = RefCityScapes("val", root_val, crop_height, crop_width)
    dl_val = DataLoader(val_ds, batch_size=1, shuffle=False, num_workers=0)
    model = torch.nn.DataParallel(RefBiSeNet(
        backbone="STDCNet813", n_classes=num_classes,
        pretrain_model=g_pretrain_path, use_conv_last=False))
    args = argparse.Namespace(
        num_workers=0, num_classes=num_classes, optimizer="sgd",
        crop_height=crop_height, crop_width=crop_width,
        momentum=0.9,  # train_nni.py:88 reads args.momentum
        aug_type=None, root_source=root_source, root_target=root_target,
        # avoid the function-local-os crash branch (train_nni.py:180-183)
        checkpoint_step=num_epochs + 99, validation_step=1,
        save_model_path=os.path.join(workdir, "ref_nni_ckpt"))
    os.makedirs(args.save_model_path, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(workdir)
    buf = io.StringIO()
    ref_nni.GtaV = _gtav_arity_shim
    try:
        torch.manual_seed(d_seed)  # replay the captured D init
        with contextlib.redirect_stdout(buf):
            ref_nni.train_DA(args, model, dl_val, batch_size=batch_size,
                             learning_rate=learning_rate,
                             learning_rate_D=learning_rate_d,
                             num_epochs=num_epochs,
                             lambda_adv_target1=lambda_adv,
                             weight_decay=weight_decay)
            precision, miou = ref_nni.val(args, model, dl_val)
    finally:
        ref_nni.GtaV = orig_gtav
        os.chdir(cwd)
    text = buf.getvalue()
    losses = [(float(a), float(b)) for a, b in re.findall(
        r"loss_seg = ([0-9.eE+-]+) loss_D1 = ([0-9.eE+-]+)", text)]
    assert len(losses) == num_epochs, text[-2000:]
    intermediates = list(nni_record["intermediate"])
    return d_init, losses, float(precision), float(miou), intermediates


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--pretrain_path", required=True)
    p.add_argument("--crop_height", type=int, default=512)
    p.add_argument("--crop_width", type=int, default=1024)
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--use_conv_last", action="store_true")
    p.add_argument("--dataset", default="Cityscapes",
                   choices=["Cityscapes", "GTAV"],
                   help="GTAV = reference --dataset GTAV --domain_shift "
                        "(val() over the 75/25 split's val quarter)")
    a = p.parse_args(argv)
    fn = run_reference_val_gtav if a.dataset == "GTAV" else run_reference_val
    precision, miou = fn(
        a.root, a.pretrain_path, a.crop_height, a.crop_width,
        a.num_classes, a.use_conv_last)
    print(json.dumps({"precision": precision, "miou": miou}))


if __name__ == "__main__":
    main()
