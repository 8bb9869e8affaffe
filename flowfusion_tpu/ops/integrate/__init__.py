"""On-device ODE/SDE integration (the framework's replacement for torchdiffeq).

``odeint`` is the single entry point: it dispatches to the adaptive embedded
RK solvers (dopri5, bosh3, fehlberg2, adaptive_heun, dop853), the fixed-grid
solvers (euler, midpoint, heun3, rk4), or the fixed-grid Adams multistep
solvers (explicit_adams, implicit_adams) by method name, mirroring the
``torchdiffeq.odeint`` call signature used throughout the reference
(diffusion.py:620-639, 733-752; flow.py:286-306, 357-382; symplectic.py:237).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .adaptive import SolverStats, odeint_adaptive, odeint_per_sample
from .adjoint import odeint_adjoint
from .fixed import FIXED_METHODS, EMResult, euler_maruyama, odeint_fixed
from .multistep import MULTISTEP_METHODS, odeint_multistep
from .tableaus import ADAPTIVE_TABLEAUS

__all__ = [
    "odeint",
    "odeint_adaptive",
    "odeint_per_sample",
    "odeint_adjoint",
    "odeint_fixed",
    "odeint_multistep",
    "euler_maruyama",
    "SolverStats",
    "EMResult",
]


def odeint(
    func: Callable,
    y0: Any,
    ts,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    options: Optional[dict] = None,
):
    """Integrate dy/dt = func(t, y) through the times ``ts``.

    Returns ``(ys, stats)``; for fixed-step methods ``stats`` is None.
    Default tolerances match torchdiffeq's (rtol=1e-7, atol=1e-9), which the
    reference relies on in ``ODEFlow.sample`` (flow.py:297-306 passes none).
    """
    if method in ADAPTIVE_TABLEAUS:
        return odeint_adaptive(
            func, y0, ts, rtol=rtol, atol=atol, method=method, options=options
        )
    if method in FIXED_METHODS or method in MULTISTEP_METHODS:
        import numpy as _np

        opts = dict(options or {})
        if "step_size" in opts:
            # torchdiffeq-style: uniform step size; converted to per-interval
            # sub-steps (ceil, so the effective step is never larger).
            h = float(opts.pop("step_size"))
            spans = _np.abs(_np.diff(_np.asarray(ts, float)))
            steps = max(1, int(_np.ceil(float(_np.max(spans)) / h)))
        else:
            default = 16 if method in MULTISTEP_METHODS else 1
            if "steps_per_interval" in opts and "steps" in opts:
                # Both spellings present: refuse rather than silently
                # preferring one (a nested-pop default would consume and
                # discard 'steps' before the unknown-option guard ran).
                raise ValueError(
                    "pass either 'steps_per_interval' or its alias "
                    "'steps', not both"
                )
            if "steps_per_interval" in opts:
                steps = int(opts.pop("steps_per_interval"))
            else:
                steps = int(opts.pop("steps", default))
        if opts:
            raise ValueError(f"unknown fixed-step options: {sorted(opts)}")
        if method in MULTISTEP_METHODS:
            return (
                odeint_multistep(
                    func, y0, ts, method=method, steps_per_interval=steps
                ),
                None,
            )
        return (
            odeint_fixed(func, y0, ts, method=method, steps_per_interval=steps),
            None,
        )
    if method == "dop853":
        # Registered only when scipy (its coefficient source) is importable.
        from .tableaus import get_adaptive_tableau

        get_adaptive_tableau(method)  # raises the actionable error
    raise ValueError(
        f"unknown method {method!r}; adaptive: {sorted(ADAPTIVE_TABLEAUS)}, "
        f"fixed: {sorted(FIXED_METHODS)}, multistep: {sorted(MULTISTEP_METHODS)}"
    )
