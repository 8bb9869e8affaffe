"""Observability: profiling contexts, solver-stat summaries, NaN checks.

The reference's only observability is tqdm bars and prints (SURVEY.md §5.1
and §5.5).  Here the compiled solvers return their own counters
(``SolverStats``) because the host cannot observe an on-device loop; this
module adds the host-side conveniences around them.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Dict

import jax
import numpy as np

__all__ = [
    "trace_annotation",
    "profiler_trace",
    "summarize_stats",
    "Timer",
    "assert_all_finite",
]


def trace_annotation(name: str):
    """Named region visible in a jax.profiler trace (and TensorBoard)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a device trace to ``log_dir`` for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_stats(stats) -> Dict[str, Any]:
    """SolverStats -> plain dict of python numbers (host-side).

    Handles both batch-global stats (scalar counters, from ``odeint``) and
    the per-sample (B,)-shaped stats returned by the per-sample solvers
    (``log_prob_per_sample`` / ``odeint_per_sample``) — the latter are
    summarized as totals plus per-sample min/mean/max.
    """
    if stats is None:
        return {}
    nfe = np.asarray(stats.n_func_evals)
    acc = np.asarray(stats.n_accepted)
    rej = np.asarray(stats.n_rejected)
    ok = np.asarray(stats.succeeded)
    if nfe.ndim == 0:
        return {
            "n_func_evals": int(nfe),
            "n_accepted": int(acc),
            "n_rejected": int(rej),
            "reject_fraction": float(int(rej) / max(1, int(acc) + int(rej))),
            "succeeded": bool(ok),
        }
    return {
        "n_samples": int(nfe.shape[0]),
        "n_func_evals_total": int(nfe.sum()),
        "n_func_evals_per_sample": {
            "min": int(nfe.min()), "mean": float(nfe.mean()), "max": int(nfe.max())
        },
        "n_accepted_total": int(acc.sum()),
        "n_rejected_total": int(rej.sum()),
        "reject_fraction": float(rej.sum() / max(1, acc.sum() + rej.sum())),
        "succeeded": bool(ok.all()),
        "n_failed_samples": int((~ok.astype(bool)).sum()),
    }


@dataclasses.dataclass
class Timer:
    """Wall-clock timer that blocks on device results.

    with Timer() as t:
        out = fn(...)
        t.block_on(out)
    print(t.seconds)
    """

    seconds: float = 0.0
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def block_on(self, x):
        """Synchronize on ``x`` so the timed window covers its execution."""
        jax.block_until_ready(x)
        return x

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


def assert_all_finite(tree: Any, name: str = "value") -> None:
    """Host-side finite check over a pytree (raises with the leaf path)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            loc = "".join(str(p) for p in path)
            bad = int(np.size(arr) - np.isfinite(arr).sum())
            raise FloatingPointError(
                f"{name}{loc}: {bad}/{arr.size} non-finite elements"
            )
