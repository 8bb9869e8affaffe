"""Continuous-adjoint differentiation through the adaptive ODE solver.

The reference trains through solves with ``torchdiffeq.odeint_adjoint``
(selected when ``self.training`` / ``adjoint=True``: diffusion.py:620, 733;
flow.py:286-295, 357-368).  JAX's ``lax.while_loop`` is not
reverse-differentiable, so gradients through the adaptive solver use the
same O(1)-memory method (Pontryagin/Chen et al. 2018): a ``custom_vjp``
whose backward pass integrates the augmented adjoint system

    d/dt [y, a_y, a_theta] = [f, -a_y^T df/dy, -a_y^T df/dtheta]

backwards through each output interval, accumulating the output cotangents
at every requested time.  Forward and backward both run on-device in the
same ``lax.while_loop`` adaptive solver (``odeint_adaptive``).

``func`` must take its differentiable parameters explicitly:
``func(t, y, params)``.  Values it *closes over* (e.g. a conditioning
batch) are hoisted with ``jax.closure_convert`` so gradients flow into
them too instead of raising ``CustomVJPException``.  Output times are
static floats, so no gradients w.r.t. ``ts`` exist by construction
(matching this library's API).

Failure surface: a solve that exhausts ``max_num_steps`` (forward or any
backward interval) poisons its outputs with NaN — stats cannot cross the
custom-vjp boundary, and silently-finite wrong gradients would be worse.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .adaptive import odeint_adaptive
from .tableaus import ADAPTIVE_TABLEAUS

__all__ = ["odeint_adjoint"]


def odeint_adjoint(
    func: Callable[[jax.Array, Any, Any], Any],
    y0: Any,
    ts: Sequence[float],
    params: Any,
    *,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    method: str = "dopri5",
    options: Optional[dict] = None,
    adjoint_rtol: Optional[float] = None,
    adjoint_atol: Optional[float] = None,
):
    """Differentiable odeint: returns only ``ys`` (stats are not
    differentiable and intentionally omitted from the custom-vjp surface).
    """
    if method not in ADAPTIVE_TABLEAUS:
        raise ValueError(
            f"odeint_adjoint is adaptive-only; method {method!r} is not one "
            f"of {sorted(ADAPTIVE_TABLEAUS)} (fixed-step/multistep methods "
            "are differentiable directly through lax.scan — call odeint "
            "without adjoint instead)"
        )
    ts = tuple(float(t) for t in np.asarray(ts, np.float64))
    # Hoist anything func closes over (conditioning batches, standardization
    # stats, ...) into explicit differentiable arguments, so cotangents can
    # flow into them through the custom_vjp boundary.
    t0 = jnp.asarray(ts[0], jnp.float32)
    converted, consts = jax.closure_convert(func, t0, y0, params)

    def func_pc(t, y, params_and_consts):
        p, c = params_and_consts
        return converted(t, y, p, *c)

    return _odeint_adjoint(
        func_pc,
        ts,
        float(rtol),
        float(atol),
        method,
        _hashable_options(options),
        float(adjoint_rtol if adjoint_rtol is not None else rtol),
        float(adjoint_atol if adjoint_atol is not None else atol),
        y0,
        (params, tuple(consts)),
    )


def _hashable_options(options):
    if options is None:
        return None
    return tuple(sorted(options.items()))


def _poison_on_failure(tree, stats):
    """NaN-poison a solve's outputs when it exhausted max_num_steps.

    SolverStats cannot cross the custom-vjp boundary, so an exhausted
    solve would otherwise yield silently-finite wrong values/gradients;
    NaN makes the failure loud in the loss instead.
    """
    return jax.tree_util.tree_map(
        lambda a: jnp.where(stats.succeeded, a, jnp.nan), tree
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _odeint_adjoint(
    func, ts, rtol, atol, method, options, adj_rtol, adj_atol, y0, params
):
    ys, stats = odeint_adaptive(
        lambda t, y: func(t, y, params),
        y0,
        ts,
        rtol=rtol,
        atol=atol,
        method=method,
        options=dict(options) if options else None,
    )
    return _poison_on_failure(ys, stats)


def _fwd(func, ts, rtol, atol, method, options, adj_rtol, adj_atol, y0, params):
    ys = _odeint_adjoint(
        func, ts, rtol, atol, method, options, adj_rtol, adj_atol, y0, params
    )
    return ys, (ys, params)


def _bwd(func, ts, rtol, atol, method, options, adj_rtol, adj_atol, res, g_ys):
    ys, params = res
    n = len(ts)

    def y_at(i):
        return jax.tree_util.tree_map(lambda a: a[i], ys)

    def g_at(i):
        return jax.tree_util.tree_map(lambda a: a[i], g_ys)

    zero_params = jax.tree_util.tree_map(jnp.zeros_like, params)

    def aug_dynamics(t, aug):
        y, a_y, _ = aug
        y_dot, vjp_fn = jax.vjp(lambda yy, pp: func(t, yy, pp), y, params)
        neg_ay = jax.tree_util.tree_map(jnp.negative, a_y)
        va_y, va_p = vjp_fn(neg_ay)
        return (y_dot, va_y, va_p)

    a_y = g_at(n - 1)
    a_p = zero_params

    # Integrate each interval [ts[i], ts[i-1]] backwards, re-seeding the
    # state with the stored forward solution at the interval's right edge.
    # NOTE: this Python loop unrolls one adaptive solve per output interval
    # (the intervals have different endpoints, so folding it into lax.scan
    # would need a time-rescaled RHS).  Every production adjoint call site
    # uses a 2-point grid, where the loop has length 1; dense-trajectory
    # adjoints pay compile time linear in len(ts).
    for i in range(n - 1, 0, -1):
        aug0 = (y_at(i), a_y, a_p)
        aug_ys, bwd_stats = odeint_adaptive(
            aug_dynamics,
            aug0,
            [ts[i], ts[i - 1]],
            rtol=adj_rtol,
            atol=adj_atol,
            method=method,
            options=dict(options) if options else None,
        )
        _, a_y, a_p = _poison_on_failure(
            jax.tree_util.tree_map(lambda a: a[-1], aug_ys), bwd_stats
        )
        if i - 1 > 0:
            a_y = jax.tree_util.tree_map(jnp.add, a_y, g_at(i - 1))

    # cotangent for y0 also receives the (identity) contribution of ys[0].
    a_y0 = jax.tree_util.tree_map(jnp.add, a_y, g_at(0))
    return a_y0, a_p


_odeint_adjoint.defvjp(_fwd, _bwd)
