"""Device profiling helpers: xprof traces, annotations, memory stats.

The reference has no profiling surface at all (SURVEY.md §5 lists
tracing/profiling as an auxiliary subsystem the rebuild must supply);
solver-level counters live in ``ops.integrate.SolverStats`` and
``utils.diagnostics`` — this module adds the HARDWARE side: capture an
xprof/TensorBoard trace of any region, annotate solver phases so they
are findable in the timeline, and read per-device HBM usage.

Usage::

    from flowfusion_tpu.utils import profiling

    with profiling.trace("/tmp/xprof"):        # view in TensorBoard
        lp, _ = model.log_prob(x)
        jax.block_until_ready(lp)

    with profiling.annotate("strict-solve"):   # named timeline region
        ...

    profiling.device_memory()                  # per-device HBM dict
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "device_memory", "format_device_memory"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_trace: bool = False) -> Iterator[None]:
    """Capture an xprof trace of the enclosed region into ``log_dir``.

    Thin wrapper over ``jax.profiler.trace`` that exists so callers do
    not depend on the jax.profiler import path (it has moved across jax
    versions), plus the block-until-ready reminder: UNSYNCED async
    dispatch makes a region look instant — block on the region's outputs
    inside the context or the trace records only dispatch time.
    """
    with jax.profiler.trace(
        log_dir, create_perfetto_trace=create_perfetto_trace
    ):
        yield


def annotate(name: str):
    """Named region for the profiler timeline (``TraceAnnotation``).

    Also usable as a decorator context around solver phases so a
    captured trace shows e.g. 'strict-solve' spans instead of raw op
    names.
    """
    return jax.profiler.TraceAnnotation(name)


def device_memory(device: Optional[jax.Device] = None) -> dict:
    """Per-device memory statistics (bytes), keyed by device string.

    Returns ``{str(device): stats_dict}`` using each backend's
    ``memory_stats()`` (TPU: HBM in_use/limit/peak; some CPU backends
    return None — mapped to an empty dict rather than raising, so
    callers can log unconditionally).
    """
    devices = [device] if device is not None else jax.local_devices()
    out = {}
    for d in devices:
        stats = d.memory_stats() if hasattr(d, "memory_stats") else None
        out[str(d)] = dict(stats) if stats else {}
    return out


def format_device_memory(device: Optional[jax.Device] = None) -> str:
    """One human-readable line per device: in-use / peak / limit HBM."""

    def gb(n):
        return f"{n / 2**30:.2f} GiB"

    lines = []
    for name, s in device_memory(device).items():
        if not s:
            lines.append(f"{name}: (no memory stats on this backend)")
            continue
        in_use = s.get("bytes_in_use")
        peak = s.get("peak_bytes_in_use")
        limit = s.get("bytes_limit")
        parts = [f"in use {gb(in_use)}" if in_use is not None else None,
                 f"peak {gb(peak)}" if peak is not None else None,
                 f"limit {gb(limit)}" if limit is not None else None]
        lines.append(f"{name}: " + ", ".join(p for p in parts if p))
    return "\n".join(lines)
