"""Orbax checkpointing with resume.

Replaces the reference's DeepSpeed ``save_checkpoint`` / ``torch.load``
cycle (/root/reference/stage1_train_prior_model.py:28-63,328-331) with
orbax: atomic multihost-sync saves of {params, opt_state, step, epoch}
every ``checkpointing_steps``, plus latest-step discovery for
``--resume_from_checkpoint`` parity.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Dict[str, Any],
                    epoch: int = 0, max_to_keep: int = 5):
    mgr = _manager(directory, max_to_keep)
    payload = dict(state)
    payload["epoch"] = epoch
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state_example: Dict[str, Any],
                       step: Optional[int] = None):
    """Restore into the structure of state_example (with epoch added).
    Returns (state, epoch, step)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    template = dict(state_example)
    template["epoch"] = 0
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(template))
    mgr.close()
    epoch = int(restored.pop("epoch"))
    return restored, epoch, step
