"""Host input-pipeline throughput bench (SURVEY.md section 7 hard part e).

Quantifies whether the host decode path can feed the TPU: per-image cost
of decode + PIL-faithful resize for the native C++ loader
(native/loader.cpp) vs the PIL fallback, at full Cityscapes source
resolution (2048x1024 RGB PNG + uint8 label PNG -> 1024x512 tensors,
reference cityscapes.py:61-69 semantics), plus the end-to-end Loader
(data/pipeline.py) rate.

Prints img/s per core and the number of cores needed to sustain the
measured TPU consumption rates (bench.py infer / BENCH_TRAIN). Noise
PNGs compress worst-case, so decode numbers are conservative vs real
Cityscapes frames.

MEASUREMENT VALIDITY: run on an OTHERWISE-IDLE machine. This box has one
CPU core; a concurrent pytest run inflated every number ~2x in early
round-2 measurements (and unevenly, which briefly faked a resize
speedup). Canonical idle-core numbers live in CLAUDE.md.

Run (CPU-only, safe alongside chip jobs):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_loader.py
"""

import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dasemanticsegmentationaml_tpu.data import native  # noqa: E402
from dasemanticsegmentationaml_tpu.data import transforms_host  # noqa: E402
from dasemanticsegmentationaml_tpu.data.datasets import CityScapes  # noqa: E402
from dasemanticsegmentationaml_tpu.data.pipeline import Loader  # noqa: E402

SRC_H, SRC_W = 1024, 2048   # full Cityscapes frame
OUT_HW = (512, 1024)        # reference crop_height/crop_width defaults
N_IMAGES = 8

# TPU consumption rates to compare against (CLAUDE.md measured numbers).
RATES = {"train bs=128": 653.6, "infer bs=128": 2664.0}


def synth_frame(rng, structured: bool) -> np.ndarray:
    """Noise = worst-case PNG decode; structured = piecewise-smooth scene
    (closer to real street frames' compression/decode cost)."""
    if not structured:
        return rng.integers(0, 255, (SRC_H, SRC_W, 3), dtype=np.uint8)
    yy = np.linspace(0, 255, SRC_H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 255, SRC_W, dtype=np.float32)[None, :]
    img = np.stack([yy + 0 * xx, 0 * yy + xx, 0.5 * (yy + xx)], -1)
    for _ in range(40):  # rectangles approximating objects
        y0, x0 = rng.integers(0, SRC_H - 64), rng.integers(0, SRC_W - 64)
        h, w = rng.integers(32, 256, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.integers(0, 255, 3)
    return img.astype(np.uint8)


def make_tree(root: str, n: int, structured: bool) -> None:
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "images", "train", "city")
    lbl_dir = os.path.join(root, "gtFine", "train", "city")
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    for i in range(n):
        Image.fromarray(synth_frame(rng, structured)).save(
            os.path.join(img_dir, f"c_{i:03d}.png"))
        if structured:
            lbl = (synth_frame(rng, True)[..., 0] // 14).astype(np.uint8)
        else:
            lbl = rng.integers(0, 19, (SRC_H, SRC_W), dtype=np.uint8)
        Image.fromarray(lbl, mode="L").save(
            os.path.join(lbl_dir, f"c_{i:03d}_labelTrainIds.png"))


def time_per_sample(img_paths, lbl_paths, reps: int) -> float:
    """Seconds per (image+label) decode+resize pair, best of reps."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for ip, lp in zip(img_paths, lbl_paths):
            transforms_host.load_image(ip, OUT_HW)
            transforms_host.load_label(lp, OUT_HW)
        best = min(best, (time.perf_counter() - t0) / len(img_paths))
    return best


def run_variant(structured: bool) -> None:
    with tempfile.TemporaryDirectory() as root:
        make_tree(root, N_IMAGES, structured)
        img_dir = os.path.join(root, "images", "train", "city")
        lbl_dir = os.path.join(root, "gtFine", "train", "city")
        imgs = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
        lbls = sorted(os.path.join(lbl_dir, f) for f in os.listdir(lbl_dir))

        # Warm the page cache so we time decode, not disk.
        for p in imgs + lbls:
            with open(p, "rb") as f:
                f.read()

        results = {}
        assert native.available(), "native loader should be built"
        results["native C++"] = time_per_sample(imgs, lbls, reps=3)

        real_decode = native.decode_resize
        native.decode_resize = lambda *a, **k: None  # force PIL fallback
        try:
            results["PIL fallback"] = time_per_sample(imgs, lbls, reps=3)
        finally:
            native.decode_resize = real_decode

        ds = CityScapes("train", root, OUT_HW[0], OUT_HW[1])
        loader = Loader(ds, batch_size=4, shuffle=False, num_workers=1)
        for _ in loader:  # warmup epoch
            pass
        t0 = time.perf_counter()
        n = 0
        for images, labels in loader:
            n += images.shape[0]
        results["Loader e2e (1 worker)"] = (time.perf_counter() - t0) / n

    kind = "structured (realistic)" if structured else "noise (worst-case)"
    print(f"{kind} {SRC_W}x{SRC_H} PNG pair -> {OUT_HW[1]}x{OUT_HW[0]}, "
          f"1 core:")
    for name, sec in results.items():
        print(f"  {name:22s} {sec * 1e3:7.1f} ms/img  {1.0 / sec:7.1f} img/s")
    per_core = 1.0 / results["native C++"]
    for name, rate in RATES.items():
        print(f"  cores to sustain {name} ({rate:.0f} img/s): "
              f"{rate / per_core:.1f}")


if __name__ == "__main__":
    run_variant(structured=True)
    run_variant(structured=False)
