"""Observability: TB-compatible scalars + structured JSONL + profiler hooks.

The reference logs tensorboardX scalars named loss_step /
epoch/loss_epoch_train / epoch/precision_val / 'epoch/miou val' / loss_G /
loss_adv (reference train.py:98,103,119-120,272-274) -- we keep the names
for dashboard parity (SURVEY.md section 5.5) and add a JSONL stream plus
images/sec (the north-star metric needs a meter, section 5.1).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, **fields):
        if self._f is None:
            return
        fields.setdefault("time", time.time())
        self._f.write(json.dumps(fields) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()


def make_writer(enabled: bool, comment: str = ""):
    """tensorboardX SummaryWriter when installed, else the native writer.

    The reference unconditionally logs TB scalars (train.py:64); this
    image ships no tensorboardX, so without the fallback the dashboard
    surface would silently vanish. utils/tb_writer.py writes real
    events.out.tfevents files from scratch (TFRecord framing + Event
    proto), so `tensorboard --logdir runs` works either way.
    """
    if not enabled:
        return None
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(comment=comment)
    except Exception:
        from .tb_writer import EventWriter, default_logdir

        return EventWriter(default_logdir(comment))


class Profiler:
    """jax.profiler trace around the first few steps (SURVEY.md 5.1)."""

    def __init__(self, trace_dir: Optional[str], num_steps: int = 8):
        self.trace_dir = trace_dir
        self.num_steps = num_steps
        self._active = False
        self._count = 0

    def step(self):
        if self.trace_dir is None:
            return
        import jax

        if not self._active and self._count == 0:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        self._count += 1
        if self._active and self._count >= self.num_steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
