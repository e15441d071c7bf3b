"""Packed decoded-sample cache: decode once, memmap every epoch after.

The reference re-decodes and re-resizes every PNG in every epoch inside
its DataLoader workers (reference train.py:465-491, cityscapes.py:61-69,
GTAV.py:80-96). Decode is the measured host bottleneck of this framework
too: the native C++ loader costs ~32 ms per 1024x512 pair on one core
(tools/bench_loader.py), so production-shape training on a small host is
decode-bound (burn-ins: 5.2 img/s vs the 654 img/s device step) and a
bs=128 step needs ~21 cores of decode. Epoch 2+ repeats all of that work
on identical bytes.

This module runs the decode+resize exactly once per (dataset contents,
resize config) and stores the results in two uint8 memmaps::

    <cache_root>/<fingerprint16>/images.u8   (N, H, W, 3) C-order
    <cache_root>/<fingerprint16>/labels.u8   (N, H, W)
    <cache_root>/<fingerprint16>/manifest.json

``CachedDataset`` then serves ``__getitem__`` as a pure memory read
(~2 MB/sample from page cache), exposing the same interface as the scan
datasets (uint8 HWC image + uint8 HW label, ``needs_remap``,
``aug_type``), so Loader / prepare_batch / augmentation are untouched —
samples are BYTE-IDENTICAL to the decode path (tests/test_cache.py).

Staleness: the fingerprint hashes the dataset type, resize config, and
every (path, size, mtime_ns) pair, so edits, additions, or reorderings
produce a different cache directory and the stale one is simply unused.
Publication is atomic (build into a tmp dir, os.rename into place), so
concurrent builders (multi-process CLI ranks on a shared FS) race
harmlessly: the first rename wins, losers discard their tmp dir. Ranks
on non-shared filesystems each build their own copy by the same code
path — no cross-host coordination is required or assumed.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import socket
import time
import uuid
from typing import Optional, Tuple

import numpy as np

_MANIFEST = "manifest.json"
_IMAGES = "images.u8"
_LABELS = "labels.u8"
# v2: native loader's NEAREST resize switched to Pillow's cumulative-
# addition index math (bit-exact parity fix) — caches built by v1 can
# hold labels off by one source row/column at some geometries
_VERSION = 2


def dataset_fingerprint(dataset) -> str:
    """Content hash of a pair-scan dataset (CityScapes / GtaV / any
    object with ``.pairs`` of (image_path, label_path)).

    Hashes dataset type, resize config, and per-file (path, size,
    mtime_ns) stats — NOT file bytes, so fingerprinting a 25k-image
    dataset is a metadata walk, not a read.
    """
    h = hashlib.sha256()
    # Subset forwards attribute reads to its base dataset (__getattr__),
    # so a plain .pairs read would silently fingerprint the FULL dataset
    # for any subset of it; unwrap explicitly, folding the index view
    # into the hash at each level.
    while "indices" in vars(dataset) and "dataset" in vars(dataset):
        # int() each index: Subset callers routinely pass numpy arrays /
        # np.int64 lists, which json.dumps rejects with a TypeError
        h.update(json.dumps(
            {"subset": [int(i) for i in vars(dataset)["indices"]]}
        ).encode())
        dataset = vars(dataset)["dataset"]
    pairs = getattr(dataset, "pairs", None)
    if pairs is None:
        raise TypeError(
            f"{type(dataset).__name__} has no .pairs — the packed cache "
            "only wraps path-scan datasets (CityScapes/GtaV)")
    h.update(json.dumps({
        "version": _VERSION,
        "type": type(dataset).__name__,
        "height": dataset.height,
        "width": dataset.width,
        "faithful_resize": bool(dataset.faithful_resize),
        "needs_remap": bool(dataset.needs_remap),
    }, sort_keys=True).encode())
    for image_path, label_path in pairs:
        for p in (image_path, label_path):
            st = os.stat(p)
            h.update(f"{p}\0{st.st_size}\0{st.st_mtime_ns}\0".encode())
    return h.hexdigest()


class CachedDataset:
    """Memmap-backed view over a built cache directory.

    Same sample contract as the scan datasets (data/datasets.py): uint8
    HWC image, uint8 HW label. ``aug_type`` is carried from the wrapped
    dataset at open time (it parameterizes the on-device pipeline, not
    the cached bytes).
    """

    def __init__(self, cache_dir: str, aug_type: Optional[str] = None):
        with open(os.path.join(cache_dir, _MANIFEST)) as f:
            man = json.load(f)
        if man.get("version") != _VERSION:
            raise ValueError(f"cache version {man.get('version')} != "
                             f"{_VERSION} at {cache_dir}")
        self._man = man
        self.cache_dir = cache_dir
        n, h, w = man["length"], man["sample_height"], man["sample_width"]
        self._images = np.memmap(os.path.join(cache_dir, _IMAGES),
                                 dtype=np.uint8, mode="r",
                                 shape=(n, h, w, 3))
        self._labels = np.memmap(os.path.join(cache_dir, _LABELS),
                                 dtype=np.uint8, mode="r",
                                 shape=(n, h, w))
        self._needs_remap = bool(man["needs_remap"])
        self.aug_type = aug_type
        self.height = man["height"]
        self.width = man["width"]
        self.faithful_resize = bool(man["faithful_resize"])

    def __len__(self) -> int:
        return self._man["length"]

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        # np.array copies: the page-cache read happens HERE, in the
        # Loader's worker thread, not later under np.stack
        return np.array(self._images[idx]), np.array(self._labels[idx])

    @property
    def needs_remap(self) -> bool:
        return self._needs_remap


def build_cache(dataset, cache_dir: str, num_workers: int = 4) -> str:
    """Decode every sample of ``dataset`` into ``cache_dir`` (atomic).

    Returns ``cache_dir``. Safe under concurrent builders: each builds
    into a private tmp dir and the first ``os.rename`` wins.
    """
    parent = os.path.dirname(os.path.abspath(cache_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    # hostname + pid + random: pid alone COLLIDES across hosts sharing the
    # cache FS (containerized ranks are routinely all pid 1), making two
    # builders write the same tmp memmaps concurrently
    tmp = (f"{cache_dir}.tmp-{socket.gethostname()}-{os.getpid()}-"
           f"{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp)
    try:
        n = len(dataset)
        if n == 0:
            raise ValueError("refusing to cache an empty dataset")
        img0, lab0 = dataset[0]
        h, w = img0.shape[:2]
        if img0.shape != (h, w, 3) or img0.dtype != np.uint8:
            raise ValueError(f"unexpected image sample {img0.shape} "
                             f"{img0.dtype}")
        if lab0.shape != (h, w) or lab0.dtype != np.uint8:
            raise ValueError(f"unexpected label sample {lab0.shape} "
                             f"{lab0.dtype}")
        images = np.memmap(os.path.join(tmp, _IMAGES), dtype=np.uint8,
                           mode="w+", shape=(n, h, w, 3))
        labels = np.memmap(os.path.join(tmp, _LABELS), dtype=np.uint8,
                           mode="w+", shape=(n, h, w))

        def put(i):
            img, lab = dataset[i] if i else (img0, lab0)
            images[i] = img
            labels[i] = lab

        # daemon pool + non-joining teardown: a decode wedged past the
        # watchdog must neither hang the build at executor shutdown (the
        # `with ThreadPoolExecutor` form JOINS the stuck worker forever)
        # nor keep decoding every queued sample after a failure
        from .pipeline import PipelineStallError, _DaemonPool

        pool = _DaemonPool(max(1, num_workers), name="cache-build")
        try:
            for i, f in enumerate([pool.submit(put, i) for i in range(n)]):
                try:
                    f.result(timeout=600.0)
                except TimeoutError:
                    raise PipelineStallError(
                        f"cache build stalled: sample {i} not decoded "
                        f"after 600s (dataset={type(dataset).__name__}, "
                        f"tmp={tmp})") from None
        finally:
            pool.shutdown()
        images.flush()
        labels.flush()
        del images, labels
        manifest = {
            "version": _VERSION,
            "fingerprint": dataset_fingerprint(dataset),
            "length": n,
            "sample_height": h,
            "sample_width": w,
            "height": dataset.height,
            "width": dataset.width,
            "faithful_resize": bool(dataset.faithful_resize),
            "needs_remap": bool(dataset.needs_remap),
            "type": type(dataset).__name__,
        }
        with open(os.path.join(tmp, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        try:
            os.rename(tmp, cache_dir)
        except OSError:
            if not os.path.exists(os.path.join(cache_dir, _MANIFEST)):
                raise  # a real failure, not a lost publication race
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return cache_dir


def open_or_build(dataset, cache_root: str, num_workers: int = 4,
                  process_id: int = 0,
                  wait_for_publish: float = 0.0) -> CachedDataset:
    """The one-call entry: return a CachedDataset for ``dataset``,
    building the cache if this exact content+config isn't cached yet.

    Each distinct (dataset contents, resize config) gets its own
    subdirectory of ``cache_root`` keyed by fingerprint, so one
    ``--data_cache`` directory serves source/target/val datasets and
    survives dataset edits (stale entries are just never opened again).

    Multi-process: with wait_for_publish > 0, ranks > 0 POLL for rank
    0's published manifest instead of each decoding the full dataset
    into a doomed tmp dir (N-1 complete builds discarded by the rename
    race — correct but hours of wasted decode on big datasets); if the
    wait expires (rank 0 died or lives on a different filesystem) the
    rank falls back to building its own copy, which stays correct.
    """
    fp = dataset_fingerprint(dataset)
    cache_dir = os.path.join(cache_root, fp[:16])
    manifest = os.path.join(cache_dir, _MANIFEST)
    if not os.path.exists(manifest):
        if process_id > 0 and wait_for_publish > 0:
            deadline = time.monotonic() + wait_for_publish
            while (not os.path.exists(manifest)
                   and time.monotonic() < deadline):
                time.sleep(2.0)
        if not os.path.exists(manifest):
            build_cache(dataset, cache_dir, num_workers=num_workers)
    cached = CachedDataset(cache_dir,
                           aug_type=getattr(dataset, "aug_type", None))
    if cached._man["fingerprint"] != fp:  # pragma: no cover - paranoia
        raise RuntimeError(f"cache dir {cache_dir} holds a different "
                           "fingerprint; delete it and rerun")
    return cached
