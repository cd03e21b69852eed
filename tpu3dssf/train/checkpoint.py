"""Orbax checkpointing: full train state, best-metric retention.

Upgrade over the reference's ``torch.save(model.state_dict())`` of the
best-val-accuracy weights only (utils/train.py:131-136): the optimizer
state, step counter, epoch, and best metric are all saved, so resume
continues the schedule instead of restarting it (the reference's
``train_best_weights`` resume reloads weights but loses the optimizer,
main_train.py:77-78).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _mngr(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


# fixed metadata schema so save/restore trees always match structurally
_EXTRA_DEFAULTS: Dict[str, Any] = {"best_acc": 0.0, "epoch": 0}


def save_checkpoint(directory: str, step: int, state,
                    extra: Optional[Dict[str, Any]] = None):
    """Save a pytree train state (+ small metadata dict)."""
    with _mngr(directory) as mngr:
        payload = {"state": state,
                   "extra": {**_EXTRA_DEFAULTS, **(extra or {})}}
        mngr.save(step, args=ocp.args.StandardSave(payload))
        mngr.wait_until_finished()


def latest_checkpoint(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    with _mngr(directory) as mngr:
        return mngr.latest_step()


def restore_checkpoint(directory: str, step: Optional[int], state):
    """Restore into the structure of ``state`` (abstract target).

    Raises FileNotFoundError when the directory has no checkpoint, or
    when the stored tree does not structurally match ``state`` (e.g. a
    checkpoint from a different model config) — callers treat both as
    "nothing usable here".
    """
    with _mngr(directory) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found in {directory}")
        target = {"state": state, "extra": dict(_EXTRA_DEFAULTS)}
        try:
            restored = mngr.restore(
                step, args=ocp.args.StandardRestore(target))
        except ValueError as e:
            raise FileNotFoundError(
                f"checkpoint at {directory} step {step} does not match "
                f"the current model structure: {e}") from e
        return restored["state"], restored.get("extra", {}), step
