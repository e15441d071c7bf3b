"""Packed decoded-sample cache (data/cache.py): byte-identity with the
decode path, fingerprint staleness, atomic reuse, and CLI equivalence.

The cache replaces the reference's per-epoch DataLoader re-decode
(reference train.py:465-491) with a decode-once memmap; every test here
asserts the substitution is invisible to the numerics."""

import json
import os
import time

import numpy as np
import pytest

from dasemanticsegmentationaml_tpu import cli
from dasemanticsegmentationaml_tpu.data import cache as dcache
from dasemanticsegmentationaml_tpu.data.datasets import (CityScapes, GtaV,
                                                         Subset)
from dasemanticsegmentationaml_tpu.data.pipeline import Loader

from test_cli import COMMON, _mk_cityscapes, _mk_gtav


def _cityscapes(tmp_path, mode="val", n=3):
    root = str(tmp_path / "cs")
    _mk_cityscapes(root, mode, n=n)
    return CityScapes(mode, root, height=32, width=64,
                      faithful_resize=False)


def test_cache_samples_bit_identical(tmp_path):
    ds = _cityscapes(tmp_path)
    cached = dcache.open_or_build(ds, str(tmp_path / "cache"))
    assert len(cached) == len(ds)
    assert cached.needs_remap == ds.needs_remap == False  # noqa: E712
    for i in range(len(ds)):
        img_d, lab_d = ds[i]
        img_c, lab_c = cached[i]
        np.testing.assert_array_equal(img_d, img_c)
        np.testing.assert_array_equal(lab_d, lab_c)
        assert img_c.dtype == np.uint8 and lab_c.dtype == np.uint8
    # Loader batches over the cache == Loader batches over the scan
    # dataset (same shuffle order: same seed/epoch)
    ld = Loader(ds, 2, shuffle=True, seed=7, num_workers=2)
    lc = Loader(cached, 2, shuffle=True, seed=7, num_workers=2)
    for (id_, ld_), (ic_, lc_) in zip(iter(ld), iter(lc)):
        np.testing.assert_array_equal(id_, ic_)
        np.testing.assert_array_equal(ld_, lc_)


def test_cache_reused_not_rebuilt(tmp_path, monkeypatch):
    ds = _cityscapes(tmp_path)
    root = str(tmp_path / "cache")
    dcache.open_or_build(ds, root)
    (entry,) = os.listdir(root)

    def boom(*a, **k):  # a second build would be a staleness bug
        raise AssertionError("cache rebuilt for unchanged content")

    monkeypatch.setattr(dcache, "build_cache", boom)
    cached = dcache.open_or_build(ds, root)
    assert os.listdir(root) == [entry]
    np.testing.assert_array_equal(cached[0][0], ds[0][0])


def test_cache_invalidated_by_file_change(tmp_path):
    from PIL import Image

    ds = _cityscapes(tmp_path)
    root = str(tmp_path / "cache")
    dcache.open_or_build(ds, root)
    # rewrite one label with different content (size/mtime change)
    lab_path = ds.pairs[0][1]
    new_lab = np.full((32, 64), 5, dtype=np.uint8)
    Image.fromarray(new_lab, mode="L").save(lab_path)
    os.utime(lab_path, ns=(1, 1))  # force a distinct mtime_ns
    cached = dcache.open_or_build(ds, root)
    assert len(os.listdir(root)) == 2  # new fingerprint, new entry
    np.testing.assert_array_equal(cached[0][1], ds[0][1])


def test_gtav_cache_carries_remap_aug_and_splits(tmp_path):
    root = str(tmp_path / "gta")
    _mk_gtav(root, n=6, size=(32, 64))
    ds = GtaV(root, "CS-HF", height=32, width=64, faithful_resize=False)
    cached = dcache.open_or_build(ds, str(tmp_path / "cache"))
    assert cached.needs_remap is True
    assert cached.aug_type == "CS-HF"
    sub = Subset(cached, [4, 1])
    np.testing.assert_array_equal(sub[0][0], ds[4][0])
    np.testing.assert_array_equal(sub[1][1], ds[1][1])
    assert sub.needs_remap is True


def test_distinct_subsets_get_distinct_caches(tmp_path):
    """Subset.__getattr__ forwards .pairs to the base dataset; the
    fingerprint must still distinguish two different subsets (and a
    subset from its base), or they would share one cache entry."""
    ds = _cityscapes(tmp_path, n=4)
    root = str(tmp_path / "cache")
    a = dcache.open_or_build(Subset(ds, [0, 2]), root)
    b = dcache.open_or_build(Subset(ds, [1, 3]), root)
    full = dcache.open_or_build(ds, root)
    assert len(os.listdir(root)) == 3
    assert len(a) == len(b) == 2 and len(full) == 4
    np.testing.assert_array_equal(a[1][0], ds[2][0])
    np.testing.assert_array_equal(b[0][0], ds[1][0])


def test_cache_requires_pair_datasets():
    from dasemanticsegmentationaml_tpu.data.datasets import (
        SyntheticSegDataset,
    )

    with pytest.raises(TypeError):
        dcache.dataset_fingerprint(SyntheticSegDataset(length=2))


def test_cli_supervised_with_cache_matches_without(tmp_path):
    """--data_cache must be numerically invisible: the same tiny
    supervised run with and without it reaches the SAME final mIoU, and
    the second cached run reuses the entries (no rebuild)."""
    root = str(tmp_path / "cs")
    _mk_cityscapes(root, "train")
    _mk_cityscapes(root, "val", n=2)
    cache_dir = str(tmp_path / "cache")
    base = COMMON + ["--root", root, "--dataset", "Cityspaces"]
    r_plain = cli.main(base + ["--save_model_path", str(tmp_path / "a")])
    r_cache = cli.main(base + ["--save_model_path", str(tmp_path / "b"),
                               "--data_cache", cache_dir])
    assert r_plain["miou"] == pytest.approx(r_cache["miou"], abs=0.0)
    entries = sorted(os.listdir(cache_dir))
    assert len(entries) == 2  # train + val datasets
    manifests = {}
    for e in entries:
        with open(os.path.join(cache_dir, e, "manifest.json")) as f:
            manifests[e] = json.load(f)
    assert {m["type"] for m in manifests.values()} == {"CityScapes"}
    # re-run with the warm cache: same result, same entries
    r_warm = cli.main(base + ["--save_model_path", str(tmp_path / "c"),
                              "--data_cache", cache_dir])
    assert r_warm["miou"] == pytest.approx(r_plain["miou"], abs=0.0)
    assert sorted(os.listdir(cache_dir)) == entries


def test_fingerprint_accepts_numpy_subset_indices(tmp_path):
    """Subset(ds, np.ndarray) is a documented construction; np.int64
    indices must not crash the json-based fingerprint."""
    ds = _cityscapes(tmp_path)
    sub_np = Subset(ds, np.array([1, 0], dtype=np.int64))
    sub_py = Subset(ds, [1, 0])
    assert (dcache.dataset_fingerprint(sub_np)
            == dcache.dataset_fingerprint(sub_py))


def test_rank_nonzero_waits_for_published_cache(tmp_path):
    """Multi-process: a rank > 0 with wait_for_publish set opens rank 0's
    published cache without building its own; if nothing is ever
    published within the wait it falls back to building (correctness
    preserved when ranks don't share a filesystem)."""
    ds = _cityscapes(tmp_path)
    root = str(tmp_path / "cache")
    # rank 0 publishes
    dcache.open_or_build(ds, root, process_id=0)
    builds = {"n": 0}
    real_build = dcache.build_cache

    def counting_build(*a, **k):
        builds["n"] += 1
        return real_build(*a, **k)

    dcache.build_cache, orig = counting_build, dcache.build_cache
    try:
        cached = dcache.open_or_build(ds, root, process_id=1,
                                      wait_for_publish=30.0)
        assert builds["n"] == 0  # opened the published cache, no rebuild
        assert len(cached) == len(ds)
        # nothing published + tiny wait -> rank 1 builds its own copy
        root2 = str(tmp_path / "cache2")
        t0 = time.monotonic()
        cached2 = dcache.open_or_build(ds, root2, process_id=1,
                                       wait_for_publish=0.1)
        assert builds["n"] == 1
        assert time.monotonic() - t0 < 20.0
        assert len(cached2) == len(ds)
    finally:
        dcache.build_cache = orig
