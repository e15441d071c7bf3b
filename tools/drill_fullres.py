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

Run on the real chip (default env):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/drill_fullres.py
Budget ~25 min cold (two full-model compiles through the tunnel); re-runs
hit the compile cache. Results are printed as one JSON line at the end —
paste into PARITY_RUNBOOK.md's record section.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_H, SRC_W = 1024, 2048          # true Cityscapes leftImg8bit dims
CROP_H, CROP_W = 512, 1024         # reference training geometry
N_TRAIN, N_VAL = 8, 3
WORK = os.environ.get("DRILL_WORK", "/tmp/drill_fullres")


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
    mious = re.findall(r"mIoU for validation: ([0-9.]+)", proc.stdout)
    precs = re.findall(r"precision per pixel for test: ([0-9.]+)",
                       proc.stdout)
    print(f"[{tag}] wall {wall:.1f}s losses={losses} "
          f"miou={mious[-1] if mious else None}")
    return dict(wall=round(wall, 1), losses=losses,
                miou=mious[-1] if mious else None,
                precision=precs[-1] if precs else None,
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

    for r in results.values():
        if isinstance(r, dict):
            r.pop("tail", None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
