import os, sys, numpy as np
from PIL import Image

def mk_cityscapes(root, mode, n=4, size=(512, 1024)):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images", mode, "city"), exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", mode, "city"), exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (*size, 3), dtype=np.uint8)
                        ).save(os.path.join(root, "images", mode, "city", f"c_{i:03d}.png"))
        Image.fromarray(rng.integers(0, 19, size, dtype=np.uint8), mode="L"
                        ).save(os.path.join(root, "gtFine", mode, "city", f"c_{i:03d}_labelTrainIds.png"))

def mk_gtav(root, n=4, size=(512, 1024)):
    rng = np.random.default_rng(1)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (*size, 3), dtype=np.uint8)
                        ).save(os.path.join(root, "images", f"{i:05d}.png"))
        Image.fromarray(rng.integers(0, 35, size, dtype=np.uint8), mode="L"
                        ).save(os.path.join(root, "labels", f"{i:05d}.png"))

mk_cityscapes("/tmp/smoke_cs", "train", 4)
mk_cityscapes("/tmp/smoke_cs", "val", 2)
mk_gtav("/tmp/smoke_gta", 4)
print("ok")
