"""Host-side augmentation cost per menu (idle-box measurement).

--host_augment runs data/augment_pil_exact.py inside the Loader's
decode workers (the reference's deployment shape, dataset/GTAV.py:32-59
+ train.py:465-470). This measures the per-image cost of each menu at
the production 1024x512 geometry, image-only (faithful) and with label
mirroring (corrected), plus the HostAugment wrapper end-to-end over a
synthetic dataset, so the host-core budget for a target step rate is a
recorded number:

    cores_needed ~= ms_per_img * target_img_per_s / 1000

CAUTION (CLAUDE.md): concurrent pytest on this 1-core box skews host
timings ~2x — measure alone.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           PYTHONPATH=/root/repo python tools/bench_host_aug.py
"""
import os
import time

import numpy as np

from dasemanticsegmentationaml_tpu.data import HostAugment
from dasemanticsegmentationaml_tpu.data import augment_pil_exact as px
from dasemanticsegmentationaml_tpu.data import host_augment as ha
from dasemanticsegmentationaml_tpu.data.datasets import SyntheticSegDataset

H = int(os.environ.get("HAUG_H", 512))
W = int(os.environ.get("HAUG_W", 1024))
N = int(os.environ.get("HAUG_N", 12))
MENUS = ("CS-HF", "H-RP", "B-GS-R")


def bench_menu(menu, imgs, labs, labels_too, native=False):
    from dasemanticsegmentationaml_tpu.data import native_augment as na

    params = [ha.sample_params(menu, ha.rng_for(0, 0, i), H, W,
                               apply_prob=1.0) for i in range(N)]
    t0 = time.perf_counter()
    for i in range(N):
        if native:
            na.apply_family(imgs[i], menu, params[i])
            if labels_too:
                na.apply_family_label(labs[i], menu, params[i])
        else:
            px.apply_family(imgs[i], menu, params[i])
            if labels_too:
                ha.apply_family_label(labs[i], menu, params[i])
    return (time.perf_counter() - t0) / N * 1e3  # ms/img


def main():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            for _ in range(N)]
    labs = [rng.integers(0, 35, (H, W), dtype=np.uint8) for _ in range(N)]
    print(f"{W}x{H}, {N} images/menu, single core")
    from dasemanticsegmentationaml_tpu.data import native_augment as na

    for menu in MENUS:
        faithful = bench_menu(menu, imgs, labs, False)
        corrected = bench_menu(menu, imgs, labs, True)
        print(f"{menu:7s}: faithful {faithful:7.2f} ms/img "
              f"({1e3 / faithful:6.1f} img/s/core)   "
              f"corrected {corrected:7.2f} ms/img "
              f"({1e3 / corrected:6.1f} img/s/core)", flush=True)
        if na.available():
            nf = bench_menu(menu, imgs, labs, False, native=True)
            nc = bench_menu(menu, imgs, labs, True, native=True)
            print(f"{menu:7s}: NATIVE   {nf:7.2f} ms/img "
                  f"({1e3 / nf:6.1f} img/s/core)   "
                  f"corrected {nc:7.2f} ms/img "
                  f"({1e3 / nc:6.1f} img/s/core)", flush=True)

    # wrapper end-to-end (sampling + apply + RandomApply p=0.5 mix)
    base = SyntheticSegDataset(length=N, height=H, width=W,
                               raw_gta_ids=True)
    for menu in MENUS:
        ds = HostAugment(base, menu, seed=1)
        t0 = time.perf_counter()
        for i in range(N):
            ds[i]
        ms = (time.perf_counter() - t0) / N * 1e3
        print(f"HostAugment[{menu}] p=0.5 e2e: {ms:7.2f} ms/img "
              f"({1e3 / ms:6.1f} img/s/core)", flush=True)


if __name__ == "__main__":
    main()
