"""Test configuration: force an 8-device virtual CPU mesh before jax import.

All tests run on CPU (fast, deterministic, no TPU contention) with 8
virtual devices so multi-chip sharding paths are exercised for real.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, freezing the config before this file runs — update
# the live config too (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on the 1-core
# CI box (a full train-step compile is ~90s); caching lowered programs
# across runs makes re-runs minutes faster. Opt out with
# SNIPER_TPU_NO_JIT_CACHE=1 (e.g. when timing cold compiles).
if not os.environ.get("SNIPER_TPU_NO_JIT_CACHE"):
    import getpass
    import tempfile

    # per-user path: a fixed /tmp name collides on shared boxes (the
    # first user owns it; everyone else silently loses caching)
    _default_cache = os.path.join(
        tempfile.gettempdir(),
        f"sniper_tpu_jax_cache_{getpass.getuser()}")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SNIPER_TPU_JIT_CACHE", _default_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_boxes(rng, n, hw=(512, 512), min_size=4, max_size=200):
    """[n,5] random xyxy+score boxes inside an hw canvas."""
    h, w = hw
    x1 = rng.uniform(0, w - max_size, n)
    y1 = rng.uniform(0, h - max_size, n)
    bw = rng.uniform(min_size, max_size, n)
    bh = rng.uniform(min_size, max_size, n)
    scores = rng.uniform(0.01, 1.0, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh, scores], axis=1).astype(np.float32)
