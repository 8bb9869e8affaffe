"""Fixed-step linear multistep (Adams) solvers.

TPU-native equivalents of torchdiffeq's ``explicit_adams`` (Adams--Bashforth)
and ``implicit_adams`` (Adams--Moulton predictor--corrector) fixed-grid
methods — the one method family of the reference's L1 dependency
(SURVEY.md §1, torchdiffeq import sites diffusion.py:5, flow.py:3,
symplectic.py:6) the embedded-RK suite does not cover.  Useful when the RHS
is expensive (a score-network eval): after startup, AB4 costs ONE function
evaluation per step (vs 4 for rk4 at the same order) and ABM4 two.

Design notes (deliberate deltas from torchdiffeq, TPU-motivated):
  * fixed order 4 with an RK4 startup for the first 3 steps instead of
    torchdiffeq's variable-order ramp — the whole solve is one ``lax.scan``
    with a static-shape 4-deep derivative history (a variable-order ramp
    is data-dependent control flow XLA cannot tile);
  * ``implicit_adams`` runs PECE (predict, evaluate, correct, evaluate)
    rather than iterating the corrector to tolerance: two RHS evals per
    step, fixed cost, no inner while_loop;
  * the derivative history restarts at every output-grid interval, so
    non-uniform output grids remain 4th-order (each interval is integrated
    on its own uniform sub-grid).

Coefficients (standard, e.g. Hairer, Norsett & Wanner I.III.1):
  AB4: y_{n+1} = y_n + dt/24 (55 f_n - 59 f_{n-1} + 37 f_{n-2} - 9 f_{n-3})
  AM4: y_{n+1} = y_n + dt/24 ( 9 f_{n+1} + 19 f_n - 5 f_{n-1} + f_{n-2})
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .fixed import _tree_axpy as _axpy

__all__ = ["odeint_multistep", "MULTISTEP_METHODS"]

_AB4 = (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0)  # f_n .. f_{n-3}
_AM4 = (9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0)  # f_{n+1} .. f_{n-2}

MULTISTEP_METHODS = ("explicit_adams", "implicit_adams")


def _ab4_increment(hist):
    """dt-free AB4 combination of the history [f_n, f_{n-1}, f_{n-2}, f_{n-3}]."""

    def comb(h):
        return (
            _AB4[0] * h[0] + _AB4[1] * h[1] + _AB4[2] * h[2] + _AB4[3] * h[3]
        )

    return jax.tree_util.tree_map(comb, hist)


def _am4_increment(f_new, hist):
    def comb(fn, h):
        return _AM4[0] * fn + _AM4[1] * h[0] + _AM4[2] * h[1] + _AM4[3] * h[2]

    return jax.tree_util.tree_map(comb, f_new, hist)


def _push(hist, f):
    """Shift the history one slot (newest at index 0)."""
    return jax.tree_util.tree_map(
        lambda h, fl: jnp.concatenate([fl[None], h[:-1]], axis=0), hist, f
    )


def _rk4_known_k1(func, t, dt, y, k1):
    """One RK4 step reusing the already-evaluated ``k1 = f(t, y)``.

    The startup loop below always holds f(t_n, y_n) in the derivative
    history, so letting the stock ``FIXED_METHODS['rk4']`` recompute k1
    would waste one RHS evaluation per startup step (the same
    share-the-boundary-eval argument as fixed.py's leapfrog)."""
    k2 = func(t + 0.5 * dt, _axpy(y, 0.5 * dt, k1))
    k3 = func(t + 0.5 * dt, _axpy(y, 0.5 * dt, k2))
    k4 = func(t + dt, _axpy(y, dt, k3))
    upd = jax.tree_util.tree_map(
        lambda a, b, c, d: (a + 2.0 * b + 2.0 * c + d) / 6.0, k1, k2, k3, k4
    )
    return _axpy(y, dt, upd)


def _integrate_interval(func, y0, t0, dt, n_steps, method):
    """Uniform-grid Adams integration of one output interval."""
    n_startup = min(3, n_steps)

    # RK4 startup: fill the derivative history at t0, t1, ... (newest first).
    f0 = func(t0, y0)
    hist = jax.tree_util.tree_map(
        lambda f: jnp.broadcast_to(f[None], (4,) + f.shape).copy(), f0
    )
    y = y0
    t = t0
    f_t = f0  # f(t, y) — newest history entry, reused as the next k1
    for i in range(n_startup):
        y = _rk4_known_k1(func, t, dt, y, f_t)
        t = t0 + (i + 1) * dt
        f_t = func(t, y)
        hist = _push(hist, f_t)
    if n_steps <= 3:
        return y

    def body(carry, i):
        y, hist = carry
        t_n = t0 + i * dt  # current time (history newest is f(t_n, y))
        incr = _ab4_increment(hist)
        y_pred = _axpy(y, dt, incr)
        if method == "explicit_adams":
            y_new = y_pred
            f_new = func(t_n + dt, y_new)
        else:  # implicit_adams: PECE
            f_star = func(t_n + dt, y_pred)
            y_new = _axpy(y, dt, _am4_increment(f_star, hist))
            f_new = func(t_n + dt, y_new)
        return (y_new, _push(hist, f_new)), None

    steps = jnp.arange(3, n_steps, dtype=jnp.float32)
    (y, _), _ = jax.lax.scan(body, (y, hist), steps)
    return y


def odeint_multistep(
    func: Callable[[jax.Array, Any], Any],
    y0: Any,
    ts: Sequence[float] | np.ndarray,
    *,
    method: str = "implicit_adams",
    steps_per_interval: int = 16,
):
    """Integrate on the output grid ``ts`` with AB4/ABM4 sub-stepping.

    Returns a pytree whose leaves gain a leading axis of len(ts); row 0 is
    ``y0``.  ``ts`` may be increasing or decreasing (dt is signed).

    The whole trajectory is ONE ``lax.scan`` over output intervals (the
    per-interval sub-program — RK4 startup + Adams scan — is traced
    once, with the interval's (t0, dt) carried as scan inputs), so dense
    output grids do not balloon trace/compile time the way a per-interval
    Python loop would.
    """
    if method not in MULTISTEP_METHODS:
        raise ValueError(
            f"unknown multistep method {method!r}; use one of {MULTISTEP_METHODS}"
        )
    if steps_per_interval < 1:
        raise ValueError(
            f"steps_per_interval must be >= 1; got {steps_per_interval}"
        )
    ts = np.asarray(ts, np.float64)
    if ts.ndim != 1 or len(ts) < 2:
        raise ValueError("ts must be a 1-D grid with at least two times")

    # Sub-step sizes in float64 on host, cast once (the same precision
    # discipline as odeint_fixed's grid construction).
    t0s = jnp.asarray(ts[:-1], jnp.float32)
    dts = jnp.asarray((ts[1:] - ts[:-1]) / steps_per_interval, jnp.float32)

    def interval(y, t0_dt):
        t0, dt = t0_dt
        y_new = _integrate_interval(
            func, y, t0, dt, steps_per_interval, method
        )
        return y_new, y_new

    y0 = jax.tree_util.tree_map(jnp.asarray, y0)
    _, rows = jax.lax.scan(interval, y0, (t0s, dts))
    return jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, rows,
    )
