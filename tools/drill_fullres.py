"""Full-resolution runbook drill (VERDICT r3 item #7).

Runs the PARITY_RUNBOOK flow end-to-end on a synthetic Cityscapes tree at
TRUE source dims — 2048x1024 PNGs resized to the reference's 1024x512
training geometry — so the only new variable in a real-data run is the
data itself. Exercises, in order:

  1. supervised CLI training WITHOUT --data_cache  (wall-clock recorded)
  2. the same run WITH --data_cache                (wall-clock recorded)
     -> asserts EXACT parity: identical printed losses, identical val
        mIoU/precision, bit-identical best.pth parameters
  3. a warm-cache re-run                           (decode cost amortized)
  4. --export_model on the trained checkpoint + serve.py over the val dir
     -> asserts prediction PNGs appear for every val image
  5. (round 5, VERDICT r4 #5) the DA leg at true source geometry: a
     synthetic GTA5 tree at 1914x1052 + the Cityscapes tree as target,
     DW+BN discriminator warm-started from the SHIPPED reference
     checkpoint (GTA5_10_D1.pth, --d_pretrain_path), cache on/off
     -> asserts identical DA losses/mIoU and bit-identical best.pth AND
        best_D1.pth (reference train.py:134-299). DRILL_DA=0 skips.

Run on the real chip (default env):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/drill_fullres.py
Budget ~25 min cold (two full-model compiles through the tunnel; the DA
leg adds the 4-phase step compile, ~+10 min cold); re-runs hit the
compile cache. Results are printed as one JSON line at the end — paste
into PARITY_RUNBOOK.md's record section.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# env overrides let a CPU smoke run use tiny geometry (the chip drill
# keeps the true dims)
SRC_H = int(os.environ.get("DRILL_SRC_H", 1024))   # true Cityscapes dims
SRC_W = int(os.environ.get("DRILL_SRC_W", 2048))
GTA_H = int(os.environ.get("DRILL_GTA_H", 1052))   # true GTA5 frame dims
GTA_W = int(os.environ.get("DRILL_GTA_W", 1914))
CROP_H = int(os.environ.get("DRILL_CROP_H", 512))  # training geometry
CROP_W = int(os.environ.get("DRILL_CROP_W", 1024))
N_TRAIN, N_VAL = 8, 3
WORK = os.environ.get("DRILL_WORK", "/tmp/drill_fullres")
D_PTH = "/root/reference/GTA5_model/GTA5_10_D1.pth"  # shipped DW+BN D


def mk_tree(root):
    from PIL import Image

    rng = np.random.default_rng(0)
    for mode, n in (("train", N_TRAIN), ("val", N_VAL)):
        os.makedirs(os.path.join(root, "images", mode, "city"),
                    exist_ok=True)
        os.makedirs(os.path.join(root, "gtFine", mode, "city"),
                    exist_ok=True)
        for i in range(n):
            base = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
            img = np.array(Image.fromarray(base).resize(
                (SRC_W, SRC_H), Image.BILINEAR))
            Image.fromarray(img).save(os.path.join(
                root, "images", mode, "city", f"c_{i:03d}.png"))
            lab = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
            Image.fromarray(lab, mode="L").save(os.path.join(
                root, "gtFine", mode, "city",
                f"c_{i:03d}_labelTrainIds.png"))


def mk_gta_tree(root):
    """Flat GTA5 layout (images/ + labels/) at the true 1914x1052 frame
    geometry; labels palettized 'P' PNGs with raw ids 0..34 (the decode
    path must return indices, then LUT-remap on device)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(N_TRAIN):
        base = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
        img = np.array(Image.fromarray(base).resize(
            (GTA_W, GTA_H), Image.BILINEAR))
        Image.fromarray(img).save(os.path.join(
            root, "images", f"{i:05d}.png"))
        lab = Image.fromarray(
            rng.integers(0, 35, (GTA_H, GTA_W), dtype=np.uint8), mode="P")
        lab.putpalette(rng.integers(0, 256, 768, dtype=np.uint8).tolist())
        lab.save(os.path.join(root, "labels", f"{i:05d}.png"))


def run_cli(args, tag):
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "dasemanticsegmentationaml_tpu.cli"] + args,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=3000)
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-4000:])
        raise SystemExit(f"{tag}: CLI failed rc={proc.returncode}")
    losses = re.findall(r"loss for train : ([0-9.eE+-]+)", proc.stdout)
    losses += re.findall(
        r"loss_seg = ([0-9.eE+-]+) loss_D1 = [0-9.eE+-]+", proc.stdout)
    losses_d = re.findall(r"loss_D1 = ([0-9.eE+-]+)", proc.stdout)
    mious = re.findall(r"mIoU for validation: ([0-9.]+)", proc.stdout)
    precs = re.findall(r"precision per pixel for test: ([0-9.]+)",
                       proc.stdout)
    d_params = re.findall(r"The discriminator has:\s+(\d+)", proc.stdout)
    print(f"[{tag}] wall {wall:.1f}s losses={losses} "
          f"miou={mious[-1] if mious else None}")
    return dict(wall=round(wall, 1), losses=losses, losses_d=losses_d,
                miou=mious[-1] if mious else None,
                precision=precs[-1] if precs else None,
                d_params=d_params[0] if d_params else None,
                tail=proc.stdout[-800:])


def load_params(path):
    sys.path.insert(0, REPO)
    from dasemanticsegmentationaml_tpu.utils.torch_io import (
        read_torch_checkpoint,
    )

    return read_torch_checkpoint(path)


def main():
    root = os.path.join(WORK, "cs")
    if not os.path.isdir(root):
        mk_tree(root)
        print("tree built:", root, f"{N_TRAIN} train / {N_VAL} val "
              f"{SRC_W}x{SRC_H} PNGs")

    common = [
        "--root", root, "--dataset", "Cityspaces",
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        # 0-based epochs with the reference's `epoch != 0` guard: step must
        # be 1 for a 2-epoch run to write latest/best at all
        "--batch_size", "4", "--num_epochs", "2",
        "--validation_step", "1", "--checkpoint_step", "1",
        "--eval_batch_size", "1", "--num_workers", "2",
        "--tensorboard", "False",
    ]
    results = {"geometry": f"{SRC_W}x{SRC_H}->{CROP_W}x{CROP_H}"}

    results["uncached"] = run_cli(
        common + ["--save_model_path", os.path.join(WORK, "ck_plain")],
        "uncached")
    results["cached_cold"] = run_cli(
        common + ["--save_model_path", os.path.join(WORK, "ck_cache"),
                  "--data_cache", os.path.join(WORK, "cache")],
        "cached-cold")
    results["cached_warm"] = run_cli(
        common + ["--save_model_path", os.path.join(WORK, "ck_warm"),
                  "--data_cache", os.path.join(WORK, "cache")],
        "cached-warm")

    # exact parity: losses, metrics, and the saved parameters themselves
    for other in ("cached_cold", "cached_warm"):
        assert results[other]["losses"] == results["uncached"]["losses"], (
            other, results[other]["losses"], results["uncached"]["losses"])
        assert results[other]["miou"] == results["uncached"]["miou"]
    a = load_params(os.path.join(WORK, "ck_plain", "best.pth"))
    b = load_params(os.path.join(WORK, "ck_cache", "best.pth"))
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(a[k], b[k]), k
    print("cached vs uncached: losses, mIoU and best.pth BIT-identical")
    results["exact_parity"] = True

    # export + serve over the val dir
    art = os.path.join(WORK, "model.shlo")
    results["export"] = run_cli(
        common + ["--domain_shift", "True",
                  "--pretrain_path", os.path.join(WORK, "ck_plain",
                                                  "best.pth"),
                  "--save_model_path", os.path.join(WORK, "ck_export"),
                  "--export_model", art],
        "export")
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "dasemanticsegmentationaml_tpu.serve", art,
         "--images", os.path.join(root, "images", "val"),
         "--output", os.path.join(WORK, "preds")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=3000)
    serve_wall = time.monotonic() - t0
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-4000:])
        raise SystemExit("serve failed")
    preds = [f for r, _d, fs in os.walk(os.path.join(WORK, "preds"))
             for f in fs if f.endswith(".png")]
    assert len(preds) >= N_VAL, preds
    results["serve"] = {"wall": round(serve_wall, 1),
                        "n_preds": len(preds),
                        "tail": proc.stdout[-400:]}
    print(f"[serve] wall {serve_wall:.1f}s preds={len(preds)}")

    if os.environ.get("DRILL_DA", "1") != "0":
        da_leg(results, root)

    for r in results.values():
        if isinstance(r, dict):
            r.pop("tail", None)
    print(json.dumps(results))


def da_leg(results, cs_root):
    """DA at true source geometry: GTA5-shaped source tree (1914x1052),
    the Cityscapes tree as target + val, DW+BN discriminator warm-started
    from the shipped reference GTA5_10_D1.pth, cache on/off parity
    (reference train.py:134-299)."""
    gta_root = os.path.join(WORK, "gta")
    if not os.path.isdir(gta_root):
        mk_gta_tree(gta_root)
        print(f"gta tree built: {gta_root} {N_TRAIN} imgs "
              f"{GTA_W}x{GTA_H}")
    da_common = [
        "--domain_adaptation", "True",
        "--root_source", gta_root, "--root_target", cs_root,
        "--root", cs_root,   # val set = Cityscapes val
        "--crop_height", str(CROP_H), "--crop_width", str(CROP_W),
        "--batch_size", "4", "--num_epochs", "2",
        "--validation_step", "1", "--checkpoint_step", "1",
        "--eval_batch_size", "1", "--num_workers", "2",
        "--tensorboard", "False",
        "--depthwise", "True", "--batch_norm", "True",
    ]
    if os.path.exists(D_PTH):
        da_common += ["--d_pretrain_path", D_PTH]
    else:
        print(f"NOTE: shipped D checkpoint absent ({D_PTH}); "
              "DA leg runs from random D init")

    results["da_uncached"] = run_cli(
        da_common + ["--save_model_path", os.path.join(WORK, "da_plain")],
        "da-uncached")
    results["da_cached"] = run_cli(
        da_common + ["--save_model_path", os.path.join(WORK, "da_cache"),
                     "--data_cache", os.path.join(WORK, "cache_da")],
        "da-cached")
    # DW+BN discriminator parity number (reference train.py:295-299)
    assert results["da_uncached"]["d_params"] == "193194", \
        results["da_uncached"]["d_params"]
    for key in ("losses", "losses_d", "miou"):
        assert results["da_cached"][key] == results["da_uncached"][key], (
            key, results["da_cached"][key], results["da_uncached"][key])
    for name in ("best.pth", "best_D1.pth"):
        a = load_params(os.path.join(WORK, "da_plain", name))
        b = load_params(os.path.join(WORK, "da_cache", name))
        assert set(a) == set(b), name
        for k in a:
            assert np.array_equal(a[k], b[k]), (name, k)
    print("DA cached vs uncached: losses, mIoU, best.pth AND best_D1.pth "
          "BIT-identical")
    results["da_exact_parity"] = True


if __name__ == "__main__":
    main()
