"""Fixed-step ODE solvers and the Euler--Maruyama SDE sampler.

All loops are ``lax.scan`` over a static number of steps — one compiled
program, no per-step Python dispatch (the reference loops in Python:
Euler--Maruyama at diffusion.py:543-562, symplectic Euler at
symplectic.py:191-197).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "odeint_fixed",
    "euler_maruyama",
    "make_progress_callback",
    "FIXED_METHODS",
    "EMResult",
]


def _tree_axpy(y, scale, x):
    # cast the (possibly strong-f32 traced) scale per leaf so low-precision
    # carries keep their dtype under lax.scan (no carry-dtype mismatch)
    return jax.tree_util.tree_map(
        lambda a, b: a + jnp.asarray(scale, a.dtype) * b, y, x
    )


def _euler_step(func, t, dt, y):
    return _tree_axpy(y, dt, func(t, y))


def _midpoint_step(func, t, dt, y):
    k1 = func(t, y)
    k2 = func(t + 0.5 * dt, _tree_axpy(y, 0.5 * dt, k1))
    return _tree_axpy(y, dt, k2)


def _heun3_step(func, t, dt, y):
    k1 = func(t, y)
    k2 = func(t + dt / 3.0, _tree_axpy(y, dt / 3.0, k1))
    k3 = func(t + 2.0 * dt / 3.0, _tree_axpy(y, 2.0 * dt / 3.0, k2))
    upd = jax.tree_util.tree_map(lambda a, c: 0.25 * a + 0.75 * c, k1, k3)
    return _tree_axpy(y, dt, upd)


def _rk4_step(func, t, dt, y):
    k1 = func(t, y)
    k2 = func(t + 0.5 * dt, _tree_axpy(y, 0.5 * dt, k1))
    k3 = func(t + 0.5 * dt, _tree_axpy(y, 0.5 * dt, k2))
    k4 = func(t + dt, _tree_axpy(y, dt, k3))
    upd = jax.tree_util.tree_map(
        lambda a, b, c, d: (a + 2.0 * b + 2.0 * c + d) / 6.0, k1, k2, k3, k4
    )
    return _tree_axpy(y, dt, upd)


FIXED_METHODS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun3": _heun3_step,
    "rk4": _rk4_step,
}


def leapfrog(
    vq_fn: Callable[[jax.Array, jax.Array], jax.Array],
    vp_fn: Callable[[jax.Array, jax.Array], jax.Array],
    q0: jax.Array,
    p0: jax.Array,
    *,
    t0: float,
    t1: float,
    steps: int,
):
    """Stormer--Verlet (leapfrog) integration of a separable Hamiltonian.

    dq/dt = vq(t, p), dp/dt = vp(t, q) — exactly the structure of the
    symplectic model (models/nets.py SymplecticMLP, Toth+2020-style HGN).
    Leapfrog is symplectic and second-order: it preserves phase-space
    volume *exactly* step-by-step (the model's log-prob identity holds even
    at coarse step counts), unlike the reference's first-order Euler
    sampler (symplectic.py:191-197).  One kick-drift-kick per step under
    ``lax.scan``.
    """
    dt = (t1 - t0) / steps
    ts = t0 + dt * jnp.arange(steps, dtype=jnp.float32)

    def body(carry, t):
        q, p, f = carry  # f = vp_fn(t, q), carried from the previous close
        p_half = p + 0.5 * dt * f
        q_new = q + dt * vq_fn(t + 0.5 * dt, p_half)
        f_new = vp_fn(t + dt, q_new)
        p_new = p_half + 0.5 * dt * f_new
        return (q_new, p_new, f_new), None

    # the closing kick of step i is the opening kick of step i+1: carry it
    # (2N+1 force evaluations instead of 3N)
    (q, p, _), _ = jax.lax.scan(body, (q0, p0, vp_fn(t0, q0)), ts)
    return q, p


def odeint_fixed(
    func: Callable[[jax.Array, Any], Any],
    y0: Any,
    ts: Sequence[float] | np.ndarray,
    *,
    method: str = "euler",
    steps_per_interval: int = 1,
):
    """Integrate on the fixed grid ``ts`` (with optional sub-stepping).

    Returns a pytree whose leaves gain a leading axis of len(ts); row 0 is
    ``y0``.  ``ts`` may be increasing or decreasing.
    """
    step_fn = FIXED_METHODS[method]
    if steps_per_interval < 1:
        raise ValueError(
            f"steps_per_interval must be >= 1, got {steps_per_interval}"
        )
    ts = np.asarray(ts, np.float64)
    # Sub-stepped global grid: each output interval is split uniformly.
    fine = []
    for a, b in zip(ts[:-1], ts[1:]):
        fine.extend(np.linspace(a, b, steps_per_interval + 1)[:-1])
    fine.append(ts[-1])
    fine = np.asarray(fine, np.float32)
    t_pairs = jnp.stack(
        [jnp.asarray(fine[:-1]), jnp.asarray(np.diff(fine).astype(np.float32))],
        axis=1,
    )
    out_mask = np.zeros(len(fine) - 1, bool)
    out_mask[steps_per_interval - 1 :: steps_per_interval] = True

    def body(y, t_dt):
        t, dt = t_dt[0], t_dt[1]
        y1 = step_fn(func, t, dt, y)
        return y1, y1

    _, ys = jax.lax.scan(body, y0, t_pairs)
    idx = np.nonzero(out_mask)[0]
    ys_out = jax.tree_util.tree_map(lambda a: a[idx], ys)
    return jax.tree_util.tree_map(
        lambda y, rest: jnp.concatenate([y[None], rest], axis=0), y0, ys_out
    )


class EMResult(NamedTuple):
    x_mean: jax.Array  # final denoised mean (the reference's return value)
    x: jax.Array  # final noisy state
    nan_encountered: jax.Array  # scalar bool diagnostic


def _backend_supports_callbacks() -> bool:
    """Host send/recv (jax.debug.callback) support check.

    The sandbox's axon relay backend reports platform 'tpu' but cannot run
    host callbacks; it identifies itself in the client platform version.
    Other backends without host send/recv can opt out via
    FLOWFUSION_TPU_NO_CALLBACKS=1."""
    import os

    if os.environ.get("FLOWFUSION_TPU_NO_CALLBACKS"):
        return False
    try:
        return "axon" not in jax.devices()[0].client.platform_version
    except Exception:
        return True


def make_progress_callback(total: int, desc: str = "sampling"):
    """Host-side tqdm ticker for compiled scan loops (the TPU-native
    equivalent of the reference's per-step tqdm bar, diffusion.py:543).

    Returns a function suitable for ``jax.debug.callback``; the bar is
    created lazily on the first tick of each run and closed (and the
    counter reset) when ``total`` ticks arrive, so one compiled program
    can be executed repeatedly."""
    state = {"bar": None, "count": 0}

    def tick(_t):
        import tqdm

        if state["bar"] is None:
            state["bar"] = tqdm.tqdm(total=total, desc=desc)
        state["bar"].update(1)
        state["count"] += 1
        if state["count"] >= total:
            state["bar"].close()
            state["bar"] = None
            state["count"] = 0

    return tick


def euler_maruyama(
    key: jax.Array,
    drift_fn: Callable[[jax.Array, jax.Array], jax.Array],
    diffusion_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x0: jax.Array,
    *,
    t0: float,
    t1: float,
    steps: int,
    epsilon: float = 0.0,
    progress: bool = False,
) -> EMResult:
    """Euler--Maruyama integration of dx = f dt + g dW from t0 to t1.

    Matches the reference reverse-SDE sampler semantics
    (diffusion.py:510-563): ``steps`` uniform steps of dt = (t1 - t0)/steps,
    per-step noise sqrt(|dt|) * N(0,1), the *mean* update is returned (no
    noise added on the last step), iteration stops (state freezes) if t
    drops below ``epsilon`` or a NaN appears.  The NaN guard is surfaced as
    a returned flag instead of a host-side print (SURVEY.md §5.2).

    ``progress=True`` shows a host-side tqdm bar (one tick per step via
    ``jax.debug.callback`` — the reference's bar, diffusion.py:543-547);
    costs a host round-trip per step, so leave it off in benchmarks.
    """
    dt = (t1 - t0) / steps
    sqrt_dt = jnp.sqrt(jnp.abs(dt)).astype(x0.dtype)
    keys = jax.random.split(key, steps)
    # precomputed float32 time grid: accumulating t by repeated addition in
    # x0.dtype corrupts the solver times for low-precision states (bf16 has
    # 8 mantissa bits) and drifts at high step counts even in f32
    ts_grid = jnp.float32(t0) + jnp.float32(dt) * jnp.arange(
        steps, dtype=jnp.float32
    )
    if progress and not _backend_supports_callbacks():
        # e.g. the axon relay PJRT backend has no host send/recv, so
        # jax.debug.callback cannot run; degrade to no bar.
        import warnings

        warnings.warn("progress bars unsupported on this backend; disabled")
        progress = False
    tick = make_progress_callback(steps, "sample_sde") if progress else None

    def body(carry, inp):
        x, x_mean, frozen = carry
        step_key, t = inp
        if tick is not None:
            jax.debug.callback(tick, t)
        # Reference: breaks out when t < epsilon (handles discretization
        # round-off) or when NaNs appear; freezing reproduces that.
        active = (~frozen) & (t >= epsilon)
        g = diffusion_fn(t, x)
        f = drift_fn(t, x)
        new_mean = x + f * dt
        noise = jax.random.normal(step_key, x.shape, x.dtype) * sqrt_dt
        new_x = new_mean + g * noise
        has_nan = ~jnp.all(jnp.isfinite(new_x))
        use = active & ~has_nan
        x_out = jnp.where(use, new_x, x)
        mean_out = jnp.where(use, new_mean, x_mean)
        # flag only NaNs on ACTIVE steps: inactive evaluations below
        # epsilon are discarded anyway (the reference never evaluates them)
        return (x_out, mean_out, frozen | (active & has_nan)), None

    init = (x0, x0, jnp.asarray(False))
    (x, x_mean, nan_flag), _ = jax.lax.scan(body, init, (keys, ts_grid))
    return EMResult(x_mean=x_mean, x=x, nan_encountered=nan_flag)
