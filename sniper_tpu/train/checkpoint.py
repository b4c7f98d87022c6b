"""Checkpoint save/restore via Orbax.

Replaces the reference's per-epoch MXNet .params/.states checkpoints with
optimizer state (main_train.py:137-140, utils.py:45-100). The reference's
``_test``-suffix trick (BBOX_STDS folded into bbox_pred weights at save,
unfolded at load) is unnecessary here: the detector denormalizes
predictions at inference time (models/detector.py), so one set of weights
serves train and test.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 10) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state, epoch: int):
    with _manager(ckpt_dir) as mgr:
        mgr.save(epoch, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, state, epoch: int | None = None):
    """Restore into the structure of ``state`` (a template pytree)."""
    with _manager(ckpt_dir) as mgr:
        if epoch is None:
            epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return mgr.restore(epoch, args=ocp.args.StandardRestore(state))


def latest_epoch(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()
