"""Test configuration: force an 8-device CPU mesh for sharding tests.

Must run before jax initializes its backends, hence the env mutation at
import time (pytest imports conftest before test modules import jax).
"""

import os

# RUN_TPU=1 is the on-device tier: keep the real TPU backend and run only
# the ``tpu``-marked numerics tests (see pytest_collection_modifyitems).
_TPU_TIER = os.environ.get("RUN_TPU") == "1"

if not _TPU_TIER:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the adaptive-solver while_loops dominate
# test wall-clock on first compile; cache them across runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_test_cache"),
)
# In THIS process the env vars are dead (sitecustomize imports jax before
# conftest runs, snapshotting env-derived defaults — the config.update
# calls below are what engage the cache here); they are kept for the
# suite's SUBPROCESS children (CLI round-trips, distributed workers),
# which inherit os.environ and read them at their own jax import.  Keep
# the value in sync with the config.update below.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU platform and
# overwrites jax_platforms; override it back — tests must run on the local
# 8-device CPU mesh, not through the TPU tunnel (unless RUN_TPU=1).
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

# The sitecustomize also imports jax at interpreter startup, which snapshots
# env-derived config defaults BEFORE the env mutations above run — so the
# JAX_COMPILATION_CACHE_DIR env var alone never engages the cache here.
# Set the config values directly; config.update works at runtime.
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
# Small entries too: the suite compiles hundreds of modest programs and the
# win is aggregate, not per-entry.
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (long numerics/statistics batteries)",
    )


def pytest_collection_modifyitems(config, items):
    """Three CI tiers.  Default skips ``slow``-marked tests (tight edit
    loop, ~3 min on this 1-core sandbox); ``--runslow`` / RUN_SLOW=1 runs
    everything CPU (nightly / pre-merge); RUN_TPU=1 keeps the real TPU
    backend and runs ONLY the ``tpu``-marked on-device numerics tests
    (everything else assumes the 8-device CPU mesh)."""
    if _TPU_TIER:
        skip = pytest.mark.skip(
            reason="RUN_TPU tier runs only tpu-marked on-device tests"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
        return
    skip_tpu = pytest.mark.skip(
        reason="on-device tier: run with RUN_TPU=1 on a real TPU"
    )
    run_slow = config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1"
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
        elif not run_slow and "slow" in item.keywords:
            item.add_marker(skip)
