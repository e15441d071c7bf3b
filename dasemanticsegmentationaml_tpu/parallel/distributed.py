"""Multi-process (multi-host) data parallelism.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference train.py:497); SURVEY.md section 5.8 maps it to one JAX process
group over ICI. This module adds the multi-PROCESS leg so the same trainers
scale across hosts:

* ``initialize()`` wires ``jax.distributed.initialize`` (coordinator +
  process_id/num_processes from CLI flags or standard env vars);
* the mesh becomes ('dcn', 'data') via ``create_mesh_multihost`` — the
  process axis is the OUTER mesh dim so XLA's gradient all-reduce
  decomposes into intra-host ICI reduce-scatter/all-gather plus one small
  cross-host (DCN) exchange;
* each process loads only its contiguous slice of the global batch
  (``Loader(process_id=, process_count=)``) and ``global_batch_arrays``
  assembles the global jax.Arrays with
  ``jax.make_array_from_process_local_data``.

Proven on CPU without hardware: tests/test_distributed.py launches two
OS processes x 4 virtual devices each and asserts per-step losses and
final parameters match the single-process 8-device run.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and to
    jax's own auto-detection on managed TPU pods (where calling with no
    arguments is the supported path). No-op when already initialized or
    when nothing requests more than one process.
    """
    # Backend-free already-initialized check: jax.process_count() would
    # itself initialize the XLA backend, after which
    # jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address and not num_processes:
        return  # single-process run
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_rank() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of a global batch (contiguous split, rank order)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise SystemExit(
            f"--batch_size {global_batch_size} must be divisible by the "
            f"process count {n} (each process loads batch/processes "
            "samples)")
    return global_batch_size // n


def global_batch_arrays(sharding: NamedSharding, *local_arrays):
    """Assemble global jax.Arrays from each process's LOCAL host slice.

    The loader gives process r rows [r*local : (r+1)*local) of the global
    batch; with the process ('dcn') axis outermost in the mesh those rows
    are exactly the shards living on process r's devices, so
    ``make_array_from_process_local_data`` needs no cross-host data
    movement.
    """
    n = jax.process_count()
    out = []
    for local in local_arrays:
        global_shape = (local.shape[0] * n,) + local.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            sharding, np.asarray(local), global_shape))
    return tuple(out)


def allreduce_counts(hist: np.ndarray, correct: float, total: float):
    """Exact cross-process sum of eval count accumulators.

    The counts are integers held in float64; the allgather must not pass
    through jax's default fp32 (a 1024x512 val set overflows the fp32
    integer-exact range within ~32 images), so each float64 count is
    split into two fp32-exact halves (high = value mod 2^24 scaled out,
    low = remainder), allgathered, and recombined in float64 on the
    host. Exact for counts < 2^48 pixels (~10^14 -- years of val sets).
    """
    from jax.experimental import multihost_utils

    flat = np.concatenate([np.asarray(hist, np.float64).ravel(),
                           [np.float64(correct), np.float64(total)]])
    hi, lo = np.divmod(flat, np.float64(1 << 24))
    parts = np.stack([hi, lo]).astype(np.float32)
    if np.any(parts[0] >= (1 << 24)):
        raise OverflowError("eval counts exceed 2^48; shard the val set")
    gathered = np.asarray(
        multihost_utils.process_allgather(parts), np.float64)
    # (nproc, 2, n) -> exact float64 recombine, then integer-exact sum
    summed = (gathered[:, 0] * float(1 << 24) + gathered[:, 1]).sum(axis=0)
    n = hist.size
    return (summed[:n].reshape(hist.shape), float(summed[n]),
            float(summed[n + 1]))


def assert_same_across_processes(value: float, what: str,
                                 tol: float = 0.0) -> None:
    """Debug guard: all processes must agree on `value` (e.g. val mIoU
    computed redundantly per process). Uses a tiny all-gather."""
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.float64(value))
    if not np.all(np.abs(gathered - gathered[0]) <= tol):
        raise AssertionError(
            f"{what} diverged across processes: {gathered!r}")
