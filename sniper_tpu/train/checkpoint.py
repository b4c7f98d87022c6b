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


def restore_inference_variables(cfg, model, cfg_name, logger=None):
    """Init a template and restore inference variables by priority:
    orbax run dir -> reference-format pretrained (.params/.npz) ->
    random init. Shared by main_test and demo (reference
    main_test.py:54-55 load_param semantics).

    Returns ``{'params': ..., 'batch_stats': ...}``."""
    import jax
    import jax.numpy as jnp

    def log(msg):
        if logger is not None:
            logger.info(msg)
        else:
            print(msg)

    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                           train=False)
    ckpt_dir = os.path.join(
        cfg.output_path or "./output", cfg_name, str(cfg.dataset.image_set),
        "checkpoints",
    )
    if os.path.isdir(ckpt_dir):
        # rebuild the full TrainState template (orbax restores by
        # structure), then take params + batch_stats for inference
        from sniper_tpu.train.optimizer import make_optimizer
        from sniper_tpu.train.trainer import TrainState

        tx, _ = make_optimizer(cfg, epoch_size=1000,
                               params=variables["params"])
        template = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        epoch = cfg.TEST.TEST_EPOCH or None
        state = load_checkpoint(ckpt_dir, template, epoch)
        log(f"restored checkpoint from {ckpt_dir}")
        return {"params": state.params, "batch_stats": state.batch_stats}
    if str(cfg.network.pretrained or "").strip():
        from sniper_tpu.train.pretrained import load_pretrained

        variables, _ = load_pretrained(cfg, variables, logger)
        return variables
    log("no checkpoint found; using random init")
    return variables
