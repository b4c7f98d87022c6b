"""Multi-host data parallelism (parallel/distributed.py).

Two real OS processes join one jax.distributed CPU cluster (2 local
devices each -> 4-device global 'data' mesh), assemble a global batch
with shard_batch / make_array_from_process_local_data, and jit-reduce
it — proving the multi-host path end to end without multi-host
hardware. Single-process helpers are covered directly.
"""

import os
import socket
import subprocess
import sys

from sniper_tpu.parallel.distributed import global_min_steps, shard_roidb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4 and jax.local_device_count() == 2
sys.path.insert(0, %r)
from sniper_tpu.parallel.mesh import make_mesh, shard_batch
from sniper_tpu.parallel.distributed import global_min_steps
mesh = make_mesh()
local = {"x": np.arange(4, dtype=np.float32).reshape(2, 2) + 10 * pid}
gb = shard_batch(mesh, local)
assert gb["x"].shape == (4, 2), gb["x"].shape
import jax.numpy as jnp
tot = float(jax.jit(jnp.sum)(gb["x"]))
assert abs(tot - 52.0) < 1e-6, tot
assert global_min_steps(7 if pid == 0 else 5) == 5
print(f"proc {pid}: ok {tot}")
""" % (REPO,)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: ok" in out


def test_single_process_noops():
    assert global_min_steps(7) == 7
    roidb = list(range(10))
    assert shard_roidb(roidb, 0, 1) == roidb
    assert shard_roidb(roidb, 1, 3) == [1, 4, 7]
    # strided slices cover the roidb disjointly
    parts = [shard_roidb(roidb, p, 3) for p in range(3)]
    assert sorted(sum(parts, [])) == roidb


def test_maybe_init_noop():
    from sniper_tpu.config import default_config
    from sniper_tpu.parallel.distributed import maybe_init_distributed

    cfg = default_config()
    pid, n = maybe_init_distributed(cfg)
    assert (pid, n) == (0, 1)
