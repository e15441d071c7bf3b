"""Input pipeline: host batching/prefetch + on-device batch preparation.

Replaces the reference's torch DataLoader worker processes
(reference train.py:465-491) with a TPU-first split:

  host (threads): decode + PIL-faithful resize -> raw uint8 batches
  device (jit):   u8 -> float, augmentation families, ImageNet normalize,
                  256-entry label LUT remap, dtype cast (bf16)

Shipping uint8 and normalizing on device cuts host->HBM traffic 4x vs
shipping normalized fp32 (SURVEY.md section 2.2 row 5). ``device_prefetch``
keeps a configurable number of batches in flight ahead of the step loop
(double buffering), so the 11.5M-param model never waits on the host.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import queue as queue_mod
import threading
from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .augment import augment_batch
from .labels import remap_train_ids

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class PipelineStallError(RuntimeError):
    """A named, diagnosable input-pipeline stall (SURVEY.md section 5.2).

    Raised instead of hanging when a decode worker or the prefetch's
    fetch+transfer exceeds its watchdog timeout; the message names the
    STAGE ('decode worker' / 'input fetch'), the batch, and the dataset
    index so a wedged NFS mount, bad file, or wedged device claim is
    immediately attributable."""


class _DaemonPool:
    """Minimal Future-based pool of DAEMON threads.

    concurrent.futures.ThreadPoolExecutor creates non-daemon workers and
    registers an atexit hook that JOINS them — so after a watchdog raises
    PipelineStallError past a truly wedged worker (dead NFS read, wedged
    device runtime), the interpreter would still hang at exit waiting on
    that thread, turning the loud failure back into a silent hang.
    Daemon threads make both pool teardown and process exit non-blocking;
    the Future interface (result(timeout=...)) is preserved."""

    def __init__(self, num_workers: int, name: str = "worker"):
        self._q: queue_mod.SimpleQueue = queue_mod.SimpleQueue()
        self._stop = False
        self._threads = [
            threading.Thread(target=self._run, name=f"{name}-{i}",
                             daemon=True)
            for i in range(num_workers)]
        for t in self._threads:
            t.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fut, fn, args = item
            if self._stop:
                fut.cancel()
                continue
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                fut.set_result(fn(*args))
            except BaseException as e:  # noqa: BLE001 — relayed via Future
                fut.set_exception(e)

    def submit(self, fn, *args) -> futures.Future:
        fut: futures.Future = futures.Future()
        self._q.put((fut, fn, args))
        return fut

    def shutdown(self) -> None:
        """Non-blocking: pending work is cancelled, wedged threads are
        abandoned (daemon — they cannot block interpreter exit)."""
        self._stop = True
        for _ in self._threads:
            self._q.put(None)


@partial(jax.jit, static_argnames=("aug_type", "augment_labels", "remap",
                                   "dtype", "fast_geometry"))
def prepare_batch(images_u8: jax.Array, labels_u8: jax.Array,
                  key: Optional[jax.Array] = None,
                  aug_type: Optional[str] = None,
                  augment_labels: bool = False,
                  remap: bool = False,
                  dtype=jnp.float32,
                  fast_geometry: bool = False
                  ) -> Tuple[jax.Array, jax.Array]:
    """uint8 NHWC images + uint8 NHW labels -> normalized images + int32
    labels. Augmentation (if any) runs on the [0,255] float scale, matching
    the reference's PIL-before-ToTensor ordering (reference GTAV.py:87).
    fast_geometry: training-only 3-shear rotation for B-GS-R (±1 px
    envelope; see augment.rotate_nearest_3shear)."""
    imgs = images_u8.astype(jnp.float32)
    labels = labels_u8
    if aug_type is not None:
        if key is None:
            raise ValueError("augmentation requires a PRNG key")
        imgs, labels = augment_batch(imgs, labels, key, aug_type,
                                     augment_labels,
                                     fast_geometry=fast_geometry)
    imgs = imgs / 255.0
    imgs = (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    imgs = imgs.astype(dtype)
    if remap:
        labels = remap_train_ids(labels)
    labels = labels.astype(jnp.int32)
    return imgs, labels


class Loader:
    """Shuffling, batching host loader with a decode thread pool.

    Matches reference DataLoader semantics: per-epoch reshuffle, drop_last
    (reference train.py:465-470). Deterministic given (seed, epoch).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = 4, process_id: int = 0,
                 process_count: int = 1, worker_timeout: float = 120.0):
        """batch_size is the GLOBAL batch; with process_count > 1 this
        loader yields process `process_id`'s contiguous slice
        (rows [pid*local : (pid+1)*local) of each global batch, local =
        batch_size // process_count) — the multi-process analogue of
        torch's DistributedSampler, shaped for
        parallel.distributed.global_batch_arrays."""
        if batch_size % max(process_count, 1):
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"process_count {process_count}")
        if process_count > 1 and not drop_last:
            raise ValueError("process-sharded loading requires drop_last "
                             "(a ragged tail batch cannot be split evenly "
                             "across processes)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.process_id = process_id
        self.process_count = max(process_count, 1)
        # <=0 / None disables the decode watchdog (CLI --worker_timeout)
        self.worker_timeout = (worker_timeout if worker_timeout and
                               worker_timeout > 0 else None)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        # forward to epoch-aware datasets (HostAugment re-keys its
        # per-sample RNG on (seed, epoch, idx); Subset passes through
        # via __getattr__)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng((self.seed, self._epoch))
        return rng.permutation(n)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order()
        n_batches = len(self)
        bs = self.batch_size

        # Daemon pool: a wedged decode thread can neither block teardown
        # nor interpreter exit (ThreadPoolExecutor's non-daemon workers
        # are atexit-joined — the loud watchdog failure would turn back
        # into a hang when the process tries to die).
        pool = _DaemonPool(self.num_workers, name="decode")
        try:
            # Pipeline: keep up to 2 batches of sample futures in flight.
            pending = collections.deque()

            def submit(batch_idx):
                idxs = order[batch_idx * bs:(batch_idx + 1) * bs]
                if self.process_count > 1:
                    local = bs // self.process_count
                    lo = self.process_id * local
                    idxs = idxs[lo:lo + local]
                pending.append(
                    [(pool.submit(self.dataset.__getitem__, int(i)), int(i))
                     for i in idxs])

            ahead = min(2, n_batches)
            for b in range(ahead):
                submit(b)
            for b in range(n_batches):
                if b + ahead < n_batches:
                    submit(b + ahead)
                # watchdog: a wedged decode (bad file, dead NFS mount)
                # surfaces as a loud, NAMED failure instead of a silent
                # hang (SURVEY.md section 5.2)
                samples = []
                for f, ds_idx in pending.popleft():
                    try:
                        samples.append(f.result(timeout=self.worker_timeout))
                    except futures.TimeoutError:
                        raise PipelineStallError(
                            f"decode worker stalled: batch {b}, dataset "
                            f"index {ds_idx} not decoded after "
                            f"{self.worker_timeout:g}s "
                            f"(dataset={type(self.dataset).__name__}, "
                            f"num_workers={self.num_workers})") from None
                images = np.stack([s[0] for s in samples])
                labels = np.stack([s[1] for s in samples])
                yield images, labels
        finally:
            pool.shutdown()


def device_prefetch(iterator, depth: int = 2, sharding=None,
                    transfer_timeout: Optional[float] = 300.0):
    """Move host batches to device ahead of consumption (double buffering).

    sharding: optional jax.sharding.Sharding for the batch (data-parallel
    meshes); default is the single default device.
    transfer_timeout: watchdog (seconds) on each FETCH — the upstream
    ``next(iterator)`` (which, on the production trainer paths, includes
    the prepare_batch jit dispatch that a wedged device claim blocks —
    the observed VMEM-OOM failure mode) plus the device_put dispatch for
    host batches. The whole fetch runs in a daemon worker thread and a
    timeout surfaces as a named PipelineStallError instead of a silent
    hang; the wedged thread cannot block interpreter exit. None disables
    the watchdog (direct in-thread fetches). Transfer completion stays
    asynchronous as always; the watchdog guards the blocking part.
    """
    if transfer_timeout is not None and transfer_timeout <= 0:
        transfer_timeout = None  # CLI --fetch_timeout <= 0 disables
    queue = collections.deque()
    it = iter(iterator)
    sentinel = object()

    def transfer(host_batch):
        # already-on-device jax.Arrays pass through (the trainers prefetch
        # PREPARED batches — prepare() dispatched the H2D copy; a bare
        # device_put would be a no-op single-process but raises on
        # multi-process global arrays, which are not fully addressable)
        return tuple(
            x if sharding is None and isinstance(x, jax.Array)
            else jax.device_put(x, sharding)
            for x in host_batch)

    if transfer_timeout is None:
        try:
            for _ in range(depth):
                queue.append(transfer(next(it)))
        except StopIteration:
            pass
        while queue:
            nxt = queue.popleft()
            try:
                queue.append(transfer(next(it)))
            except StopIteration:
                pass
            yield nxt
        return

    pool = _DaemonPool(1, name="prefetch")
    batch_counter = [0]

    def fetch():
        try:
            return transfer(next(it))
        except StopIteration:
            return sentinel

    def fetch_checked():
        b = batch_counter[0]
        batch_counter[0] += 1
        fut = pool.submit(fetch)
        try:
            return fut.result(timeout=transfer_timeout)
        except futures.TimeoutError:
            raise PipelineStallError(
                f"input fetch stalled: batch {b} not produced after "
                f"{transfer_timeout:g}s — covers the host iterator, the "
                f"prepare-batch jit/H2D dispatch (a wedged device claim "
                f"blocks here), and device_put (sharding={sharding})"
            ) from None

    try:
        for _ in range(depth):
            r = fetch_checked()
            if r is sentinel:
                break
            queue.append(r)
        while queue:
            nxt = queue.popleft()
            r = fetch_checked()
            if r is not sentinel:
                queue.append(r)
            yield nxt
    finally:
        pool.shutdown()
