"""Measure the packed-cache win: epoch throughput of the decode path vs
the memmap cache path on identical data (host-only, no TPU needed).

Builds a synthetic Cityscapes tree at the production shape (1024x512),
then times full Loader epochs over (a) the scan dataset (native C++ /
PIL decode+resize per sample — what every epoch costs without the
cache) and (b) the CachedDataset after a one-time build. Numbers are
host-decode rates to compare against the device step (654 img/s train
@bs128): the cache is what lets a small host feed the chip.

IDLE-BOX CAVEAT (CLAUDE.md): concurrent pytest skews host numbers ~2x;
measure alone.

Measured (idle 1-core box, 2026-08-19, 24 imgs @1024x512, 4 workers):
  decode path :  36.8 img/s per epoch
  cached path : 761.0 img/s per epoch (20.7x; one-time build 29.7 img/s)
i.e. with --data_cache this host FEEDS the 654 img/s bs=128 device train
step from epoch 1 (the build runs at decode speed once), where the
decode path starved it 18x.

Usage: PYTHONPATH=/root/repo python tools/bench_cache.py [n_imgs]
"""
import shutil
import sys
import tempfile
import time
import os

import numpy as np

from dasemanticsegmentationaml_tpu.data.cache import open_or_build
from dasemanticsegmentationaml_tpu.data.datasets import CityScapes
from dasemanticsegmentationaml_tpu.data.pipeline import Loader


def mk_tree(root, n, size=(512, 1024)):
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images", "val", "city"), exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", "val", "city"), exist_ok=True)
    base = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    for i in range(n):
        img = np.roll(base, i * 7, axis=1)  # structured, like street video
        Image.fromarray(img).save(
            os.path.join(root, "images", "val", "city", f"c_{i:03d}.png"))
        lab = rng.integers(0, 19, size, dtype=np.uint8)
        from PIL import Image as I
        I.fromarray(lab, mode="L").save(
            os.path.join(root, "gtFine", "val", "city",
                         f"c_{i:03d}_labelTrainIds.png"))


def epoch_rate(ds, n_epochs=2, workers=4):
    loader = Loader(ds, 4, shuffle=True, seed=0, num_workers=workers,
                    drop_last=False)
    # warm one epoch (page cache, pool spin-up), then time
    for _ in iter(loader):
        pass
    best = float("inf")
    for e in range(n_epochs):
        loader.set_epoch(e)
        t0 = time.perf_counter()
        n = 0
        for imgs, _labs in iter(loader):
            n += imgs.shape[0]
        best = min(best, (time.perf_counter() - t0) / n)
    return 1.0 / best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    tmp = tempfile.mkdtemp(prefix="bench_cache_")
    try:
        root = os.path.join(tmp, "cs")
        mk_tree(root, n)
        ds = CityScapes("val", root, height=512, width=1024,
                        faithful_resize=True)
        t0 = time.perf_counter()
        cached = open_or_build(ds, os.path.join(tmp, "cache"))
        build_s = time.perf_counter() - t0
        decode = epoch_rate(ds)
        memmap = epoch_rate(cached)
        print(f"decode path : {decode:7.1f} img/s per epoch")
        print(f"cached path : {memmap:7.1f} img/s per epoch "
              f"({memmap / decode:.1f}x; one-time build {build_s:.1f}s "
              f"= {n / build_s:.1f} img/s)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
