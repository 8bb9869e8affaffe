"""Profiling helpers (utils/profiling.py): trace capture, annotations,
memory stats — the hardware half of the tracing aux subsystem."""

import os

import jax
import jax.numpy as jnp

from flowfusion_tpu.utils import profiling


def test_trace_writes_capture(tmp_path):
    d = str(tmp_path / "xprof")
    with profiling.trace(d):
        y = jnp.ones((128, 128)) @ jnp.ones((128, 128))
        jax.block_until_ready(y)
    # jax writes plugins/profile/<run>/... under the log dir
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
    ]
    assert found, f"no trace files under {d}"


def test_annotate_and_memory_stats():
    with profiling.annotate("unit-test-span"):
        jax.block_until_ready(jnp.zeros((8,)) + 1)
    stats = profiling.device_memory()
    assert isinstance(stats, dict) and len(stats) == len(jax.local_devices())
    # formatting never raises, with or without backend stats
    s = profiling.format_device_memory()
    assert isinstance(s, str) and s
