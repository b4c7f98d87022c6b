"""Device mesh + sharding helpers.

SNIPER's parallelism is data parallelism (the reference's only strategy:
kvstore-device gradient aggregation over 8 GPUs, main_train.py:89-94,144).
The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the 'data'
axis; the train step is a plain ``jit`` whose batch inputs are sharded
along dim 0 and whose params are replicated — XLA's auto-partitioner
inserts the gradient all-reduce over ICI, and BatchNorm statistics are
computed over the global batch (cross-replica sync-BN; a deliberate,
documented deviation from the reference's per-GPU BN — see
ARCHITECTURE.md and train/trainer.py).

A CNN detector has no sequence/expert axes, so TP/PP/SP/EP meshes are
deliberately absent (SURVEY.md §2.10). Multi-host DP extends the same
1-D mesh across processes — see parallel/distributed.py (the mesh spans
jax.devices() = all global devices once jax.distributed is initialized,
and shard_batch assembles global arrays from per-process local data).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch dict on the mesh, split along dim 0.

    Single-device meshes get a plain device_put: committed NamedSharding
    inputs force jit through the SPMD partitioner, which lowers the
    detector's train graph catastrophically on the current backend
    (measured 8.5s vs 0.46s per step on one chip). Multi-device meshes
    need the explicit layout for data parallelism.
    """
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), batch
        )
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        # multi-host: this process holds only its shard of the global
        # batch (parallel/distributed.py shards the roidb the same way);
        # assemble the global jax.Array from per-process local data
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
