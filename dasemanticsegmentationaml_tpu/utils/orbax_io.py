"""Native checkpointing: full train state with auto-resume (orbax).

The reference never saves optimizer/epoch state, so no true resume exists
(SURVEY.md section 5.4; its --epoch_start_i flag is dead). Here:

* ``save_train_state`` / ``restore_train_state``: full pytree (params, BN
  stats, optimizer state, step) via orbax -- preemption-safe resume;
* the reference-compatible ``.pth`` exports (latest/best/GTA5_*) are done
  by utils/torch_io.write_torch_checkpoint from the CLI layer.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, name: str, state: Any) -> str:
    import jax

    path = os.path.abspath(os.path.join(directory, name))
    ckptr = _checkpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)
    return path


def restore_train_state(directory: str, name: str,
                        template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    ckptr = _checkpointer()
    if template is not None:
        restored = ckptr.restore(path, item=template)
    else:
        restored = ckptr.restore(path)
    return restored


def latest_epoch_marker(directory: str) -> Optional[int]:
    """Read the resume marker written alongside checkpoints."""
    marker = os.path.join(directory, "EPOCH")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def write_epoch_marker(directory: str, epoch: int) -> None:
    # atomic tmp+rename: an open-truncate-write interrupted mid-write
    # leaves an empty/partial EPOCH, and the next --resume dies in
    # int('') — bricking exactly the preemption-recovery path the
    # marker exists for
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, f".EPOCH.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(str(epoch))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(directory, "EPOCH"))
