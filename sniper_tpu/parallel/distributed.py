"""Multi-host (multi-process) data parallelism.

The reference scales to one host's 8 GPUs via MXNet's device kvstore
(/root/reference/main_train.py:89-94); it has no multi-host story. The
TPU-native scale-out axis is more hosts x more chips under ONE global
``jax.sharding.Mesh``: each process initializes the JAX distributed
runtime, contributes its local devices, and feeds its shard of the
global batch with ``jax.make_array_from_process_local_data``. The train
step itself is unchanged — the same auto-partitioned jit emits gradient
all-reduces that ride ICI within a slice and DCN across slices.

Host-side sharding mirrors the device layout: process p of N trains on
``roidb[p::N]`` (see ``shard_roidb``), so chip extraction, negative
mining, and image IO all scale with hosts. Because every train step is
a collective over the global mesh, all processes must execute the same
step count: each epoch runs ``global_min_steps(len(loader))`` batches
(the global minimum), truncating the surplus chips of longer local
epochs — they re-enter the pool at the next epoch's chip re-roll.

Config (all optional, ``parallel.*`` / environment):
  coordinator_address  "host:port" of process 0   [SNIPER_COORDINATOR]
  num_processes        total process count        [SNIPER_NUM_PROCESSES]
  process_id           this process's rank        [SNIPER_PROCESS_ID]

With num_processes <= 1 everything is a no-op and single-host behavior
is bit-identical.
"""

from __future__ import annotations

import os

import jax


def _cfg_or_env(cfg_par, key: str, env: str, default):
    v = getattr(cfg_par, key, None)
    if v in (None, "", -1) or (isinstance(v, (int, float)) and v < 0):
        v = os.environ.get(env, default)
    return v


def maybe_init_distributed(cfg, logger=None):
    """Initialize jax.distributed when configured for >1 process.

    Returns (process_index, process_count). Safe to call unconditionally
    — single-process runs skip initialization entirely.
    """
    par = getattr(cfg, "parallel", None)
    nprocs = int(_cfg_or_env(par, "num_processes", "SNIPER_NUM_PROCESSES", 0)
                 or 0)
    if nprocs <= 1:
        return jax.process_index(), jax.process_count()
    coord = str(_cfg_or_env(par, "coordinator_address",
                            "SNIPER_COORDINATOR", ""))
    pid = int(_cfg_or_env(par, "process_id", "SNIPER_PROCESS_ID", 0) or 0)
    if not coord:
        raise ValueError(
            "parallel.num_processes > 1 requires "
            "parallel.coordinator_address (or SNIPER_COORDINATOR)"
        )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    if logger is not None:
        logger.info(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return jax.process_index(), jax.process_count()


def global_min_steps(local_steps: int) -> int:
    """The number of train steps every process can run this epoch.

    Per-process chip counts differ (different roidb slices), but each
    step is a collective over the global mesh — running unequal step
    counts would deadlock at the epoch boundary. All processes therefore
    truncate to the global minimum.
    """
    if jax.process_count() <= 1:
        return int(local_steps)
    import numpy as np
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(
        np.asarray(local_steps, np.int64)
    )
    return int(np.min(counts))


def shard_roidb(roidb, process_index: int | None = None,
                process_count: int | None = None):
    """This process's slice of the image database.

    Strided (p::N) rather than contiguous so aspect/scale statistics
    stay balanced across hosts even when the roidb is sorted.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return roidb if n <= 1 else roidb[p::n]
