"""Integrator tests: closed forms, the float64 oracle, and scipy cross-check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from flowfusion_tpu.ops.integrate import euler_maruyama, odeint
from flowfusion_tpu.ops.integrate.adaptive import odeint_adaptive

from oracles import numpy_dopri5


def test_linear_ode_exact():
    # dy/dt = -y, y(0)=1 -> y(1) = e^-1
    ys, stats = odeint(lambda t, y: -y, jnp.ones((4, 2)), [0.0, 1.0], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-5)
    assert int(stats.n_accepted) > 0 and bool(stats.succeeded)


def test_backward_integration():
    # decreasing grid: dy/dt = y integrated 1 -> 0 gives y(0) = y(1)/e
    ys, _ = odeint(lambda t, y: y, jnp.full((3,), 2.0), [1.0, 0.0], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ys[-1], 2.0 * np.exp(-1.0), rtol=1e-5)


def test_multiple_output_times():
    ts = [0.0, 0.3, 0.7, 1.0]
    ys, _ = odeint(lambda t, y: -y, jnp.ones(2), ts, rtol=1e-7, atol=1e-9)
    expected = np.broadcast_to(np.exp(-np.asarray(ts))[:, None], (4, 2))
    np.testing.assert_allclose(ys, expected, rtol=1e-5)


def test_time_dependent_rhs():
    # dy/dt = cos(t) -> y(t) = sin(t)
    ys, _ = odeint(lambda t, y: jnp.cos(t) * jnp.ones_like(y), jnp.zeros(1), [0.0, 2.0], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ys[-1], np.sin(2.0), rtol=1e-5, atol=1e-6)


def test_tuple_state_mixed_norm():
    # Augmented state (x, logp) as in the CNF solves.
    def rhs(t, state):
        x, lp = state
        return (-x, jnp.sum(x, axis=-1))

    x0 = jnp.ones((5, 2))
    lp0 = jnp.zeros((5,))
    (xs, lps), stats = odeint(rhs, (x0, lp0), [0.0, 1.0], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(xs[-1], np.exp(-1.0), rtol=1e-5)
    # d lp/dt = sum(x) = 2 e^-t -> lp(1) = 2(1 - e^-1)
    np.testing.assert_allclose(lps[-1], 2 * (1 - np.exp(-1.0)), rtol=1e-5)


@pytest.mark.parametrize("rtol,atol", [(1e-4, 1e-4), (1e-5, 1e-5)])
def test_against_float64_oracle_stiffish(rtol, atol):
    """JAX f32 solver vs independent f64 oracle with identical conventions."""
    A = np.array([[-1.0, 2.0], [-2.0, -1.0]])

    f_np = lambda t, y: A @ y
    f_jx = lambda t, y: jnp.asarray(A, jnp.float32) @ y
    y0 = np.array([1.5, -0.5])

    ys_np, nsteps = numpy_dopri5(f_np, y0, [0.0, 2.0], rtol, atol)
    ys_jx, stats = odeint(f_jx, jnp.asarray(y0, jnp.float32), [0.0, 2.0], rtol=rtol, atol=atol)
    # Value parity well inside the tolerance budget
    np.testing.assert_allclose(ys_jx[-1], ys_np[-1], rtol=0, atol=20 * atol)
    # Same amount of work (same accept/reject conventions) within f32 slack
    assert abs(int(stats.n_accepted) + int(stats.n_rejected) - nsteps) <= 2


def test_against_scipy_high_accuracy():
    def f_np(t, y):
        return np.array([y[1], -np.sin(y[0])])  # pendulum

    def f_jx(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0])])

    y0 = np.array([1.0, 0.0])
    sol = solve_ivp(f_np, (0, 5), y0, rtol=1e-10, atol=1e-12, dense_output=True)
    ys, _ = odeint(f_jx, jnp.asarray(y0, jnp.float32), [0.0, 5.0], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ys[-1], sol.y[:, -1], atol=1e-4)


def test_min_step_option():
    ys, stats = odeint(
        lambda t, y: -y,
        jnp.ones(1),
        [0.0, 1.0],
        rtol=1e-4,
        atol=1e-4,
        options={"min_step": 1e-6},
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-3)


def test_max_num_steps_bails_out():
    # NaN-producing RHS: reference torchdiffeq would spin shrinking dt;
    # we bound the loop and report failure.
    def rhs(t, y):
        return jnp.where(t > 0.5, jnp.nan, 1.0) * jnp.ones_like(y)

    ys, stats = odeint(
        rhs, jnp.zeros(1), [0.0, 1.0], rtol=1e-5, atol=1e-5,
        options={"max_num_steps": 50},
    )
    assert not bool(stats.succeeded)


@pytest.mark.parametrize("method", ["bosh3", "fehlberg2", "adaptive_heun", "tsit5"])
def test_other_adaptive_methods(method):
    ys, stats = odeint(
        lambda t, y: -y, jnp.ones(3), [0.0, 1.0], rtol=1e-5, atol=1e-6, method=method
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-3)


@pytest.mark.parametrize(
    "method,evals_per_attempt", [("adaptive_heun", 1), ("fehlberg2", 2)]
)
def test_non_fsal_last_stage_reuse_eval_count(method, evals_per_attempt):
    """The non-FSAL pairs whose final stage lands at t1 reuse that stage
    as the next step's derivative (torchdiffeq's ``f1 = k[..., -1]``
    convention) — each attempted step costs exactly n_stages - 1 fresh
    RHS evals, never an extra f(t1, y1)."""
    ys, st = odeint(
        lambda t, y: -y, jnp.ones(3), [0.0, 1.0], rtol=1e-5, atol=1e-6,
        method=method,
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-3)
    attempts = int(st.n_accepted) + int(st.n_rejected)
    # +2: the initial f0 and the Hairer init-step probe eval
    assert int(st.n_func_evals) == 2 + evals_per_attempt * attempts


def test_fixed_step_conflicting_step_options_raise():
    """'steps_per_interval' and its alias 'steps' together must raise,
    not silently drop one of them."""
    with pytest.raises(ValueError, match="not both"):
        odeint(
            lambda t, y: -y, jnp.ones(2), [0.0, 1.0], method="rk4",
            options={"steps_per_interval": 4, "steps": 64},
        )


def test_tsit5_oscillator_and_order():
    """Tsitouras 5(4): tight-tolerance accuracy on the oscillator and a
    5th-order-consistent accuracy gain vs bosh3 at equal tolerance
    (guards the 28 hand-typed tableau coefficients)."""
    # y'' = -y as a system: y(t) = cos t, y'(t) = -sin t
    rhs = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.asarray([1.0, 0.0])
    ys, stats = odeint(
        rhs, y0, [0.0, 2.0], rtol=1e-7, atol=1e-9, method="tsit5"
    )
    np.testing.assert_allclose(
        np.asarray(ys[-1]), [np.cos(2.0), -np.sin(2.0)], atol=5e-6
    )
    assert bool(stats.succeeded)

    # equal loose tolerance: the 5th-order pair lands much closer than the
    # 3rd-order one (and within ~10x of dopri5, its order twin)
    exact = float(np.cos(1.0))
    def end_err(method):
        ys, _ = odeint(rhs, y0, [0.0, 1.0], rtol=1e-4, atol=1e-6, method=method)
        return abs(float(ys[-1][0]) - exact)
    assert end_err("tsit5") < end_err("bosh3")
    assert end_err("tsit5") < 10 * end_err("dopri5") + 1e-12


@pytest.mark.parametrize("method,order", [("euler", 1), ("midpoint", 2), ("heun3", 3), ("rk4", 4)])
def test_fixed_step_orders(method, order):
    # Convergence sanity: error shrinks with more steps at the right rate-ish.
    errs = []
    for steps in (8, 16):
        ys, _ = odeint(
            lambda t, y: -y,
            jnp.ones(()),
            [0.0, 1.0],
            method=method,
            options={"steps": steps},
        )
        errs.append(abs(float(ys[-1]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.7, (method, errs, rate)


def test_solver_is_vmappable():
    # Per-sample adaptive stepping via vmap (the "fast mode" of SURVEY §7.7).
    def solve_one(y0):
        ys, stats = odeint_adaptive(
            lambda t, y: -y * y, y0, [0.0, 1.0], rtol=1e-5, atol=1e-7
        )
        return ys[-1]

    y0s = jnp.asarray([0.5, 1.0, 4.0])
    out = jax.vmap(solve_one)(y0s[:, None])
    expected = y0s / (1.0 + y0s)  # dy/dt=-y^2 -> y(t)=y0/(1+y0 t)
    np.testing.assert_allclose(out[:, 0], expected, rtol=1e-4)


def test_solver_jits_and_grads_fixed():
    # Fixed-step path is reverse-differentiable out of the box.
    def loss(y0):
        ys, _ = odeint(lambda t, y: -y, y0, [0.0, 1.0], method="rk4", options={"steps": 32})
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(jnp.ones(2))
    np.testing.assert_allclose(g, np.exp(-1.0), rtol=1e-5)


def test_euler_maruyama_ou_process():
    # OU: dx = -x dt + sqrt(2) dW has stationary N(0, 1).
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (20000, 1))
    res = euler_maruyama(
        key,
        lambda t, x: -x,
        lambda t, x: jnp.sqrt(2.0) * jnp.ones_like(x),
        x0,
        t0=0.0,
        t1=3.0,
        steps=300,
    )
    assert not bool(res.nan_encountered)
    np.testing.assert_allclose(np.std(np.asarray(res.x)), 1.0, atol=0.05)


def test_euler_maruyama_nan_guard():
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 1))
    res = euler_maruyama(
        key,
        lambda t, x: jnp.where(t > 0.5, jnp.nan, 0.0) * jnp.ones_like(x),
        lambda t, x: jnp.zeros_like(x),
        x0,
        t0=1.0,
        t1=0.0,
        steps=10,
    )
    assert bool(res.nan_encountered)
    assert np.all(np.isfinite(np.asarray(res.x_mean)))


def test_per_sample_stepping_matches_batch_global_values():
    from flowfusion_tpu.ops.integrate.adaptive import odeint_per_sample

    def rhs(t, state):
        x, lp = state
        return (-x, jnp.sum(x, axis=-1))

    x0 = jnp.asarray([[0.1, 0.2], [5.0, -3.0], [0.5, 0.5]])
    lp0 = jnp.zeros((3,))
    (xs, lps), stats = odeint_per_sample(
        rhs, (x0, lp0), [0.0, 1.0], rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(xs[:, -1], np.asarray(x0) * np.exp(-1.0), rtol=1e-5)
    # per-sample stats: one entry per row
    assert stats.n_accepted.shape == (3,)
    # the large-magnitude row must not force extra steps on the easy rows
    assert int(stats.n_accepted[0]) <= int(stats.n_accepted[1])


def test_fixed_step_size_option():
    """torchdiffeq-style options={'step_size': h} for fixed methods."""
    ys, _ = odeint(
        lambda t, y: -y, jnp.ones(1), [0.0, 1.0], method="rk4",
        options={"step_size": 0.05},
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-6)


def test_pi_controller_accuracy_and_fewer_rejections():
    """options={'controller': 'pi'}: Lund-stabilized PI step control.

    Must meet the same tolerance as the default (torchdiffeq-identical) I
    controller while rejecting fewer steps on a smooth oscillatory field
    (the whole point of the integral memory).
    """

    def rhs(t, y):
        return jnp.stack([y[1], -y[0] * (1.0 + 0.5 * jnp.sin(3.0 * t))])

    y0 = jnp.asarray([1.0, 0.0])
    ts = [0.0, 10.0]
    y_i, st_i = odeint(rhs, y0, ts, rtol=1e-6, atol=1e-8)
    y_pi, st_pi = odeint(
        rhs, y0, ts, rtol=1e-6, atol=1e-8, options={"controller": "pi"}
    )
    # Both within tolerance of each other (each is within tol of the truth).
    np.testing.assert_allclose(y_pi[-1], y_i[-1], rtol=1e-4, atol=1e-6)
    assert int(st_pi.n_rejected) <= int(st_i.n_rejected)
    # Opt-in only: unknown controller names are rejected loudly.
    with pytest.raises(ValueError, match="controller"):
        odeint(rhs, y0, ts, options={"controller": "pid"})


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_linear_ode_exact(method):
    """AB4/ABM4 reach reference accuracy on dy/dt = -y (torchdiffeq's
    explicit_adams/implicit_adams fixed-grid family)."""
    ys, stats = odeint(
        lambda t, y: -y, jnp.ones((4, 2)), [0.0, 1.0], method=method,
        options={"steps": 32},
    )
    assert stats is None
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-5)


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_fourth_order_convergence(method):
    # Halving dt must cut the error ~2^4 (RK4 startup keeps order 4).
    errs = []
    for steps in (8, 16):
        ys, _ = odeint(
            lambda t, y: -y, jnp.ones(()), [0.0, 1.0], method=method,
            options={"steps": steps},
        )
        errs.append(abs(float(ys[-1]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.3, (method, errs, rate)


def test_adams_backward_and_multiple_outputs():
    # Decreasing grid + per-interval history restart on a non-uniform grid.
    ts = [1.0, 0.6, 0.0]
    ys, _ = odeint(
        lambda t, y: y, jnp.full((3,), 2.0), ts, method="implicit_adams",
        options={"steps": 24},
    )
    expected = 2.0 * np.exp(np.asarray(ts) - 1.0)
    np.testing.assert_allclose(ys[:, 0], expected, rtol=1e-5)


def test_adams_rejects_bad_step_counts():
    """steps <= 0 must be a named ValueError, not ZeroDivisionError (0)
    or silently-returned initial state (negative: the startup loop went
    empty and the <=3 early-exit handed y0 back for every output row)."""
    from flowfusion_tpu.ops.integrate.multistep import odeint_multistep

    for bad in (0, -4):
        with pytest.raises(ValueError, match="steps_per_interval"):
            odeint_multistep(
                lambda t, y: -y, jnp.ones(2), [0.0, 1.0],
                steps_per_interval=bad,
            )


def test_adams_dense_grid_single_trace():
    """A dense output grid compiles ONE scan-over-intervals program (the
    per-interval Python loop used to emit len(ts)-1 copies) and still
    matches the analytic solution on a non-uniform grid."""
    from flowfusion_tpu.ops.integrate.multistep import odeint_multistep

    calls = 0

    def rhs(t, y):
        nonlocal calls
        calls += 1  # counts TRACES, not runtime evals
        return -y

    ts = np.concatenate([np.linspace(0, 0.5, 17), [0.7, 1.0]])
    ys = odeint_multistep(rhs, jnp.ones(3), ts, method="explicit_adams",
                          steps_per_interval=8)
    # one interval body traced once: startup (f0 + 3x(3 rk4 stages + push)) +
    # scan body (1 eval) = a small constant, nowhere near len(ts)-1 copies
    assert calls <= 16, f"interval body traced per interval? ({calls} traces)"
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0], np.exp(-ts), rtol=1e-5
    )


def test_adams_tuple_state_and_grad():
    # Augmented (x, logp)-style tuple state; scan path is reverse-differentiable.
    def rhs(t, state):
        x, lp = state
        return (-x, jnp.sum(x, axis=-1))

    x0 = jnp.ones((5, 2))
    (xs, lps), _ = odeint(
        rhs, (x0, jnp.zeros((5,))), [0.0, 1.0], method="implicit_adams",
        options={"steps": 16},
    )
    np.testing.assert_allclose(xs[-1], np.exp(-1.0), rtol=1e-5)
    np.testing.assert_allclose(lps[-1], 2 * (1 - np.exp(-1.0)), rtol=1e-5)

    def loss(y0):
        ys, _ = odeint(
            lambda t, y: -y, y0, [0.0, 1.0], method="explicit_adams",
            options={"steps": 16},
        )
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(jnp.ones(2))
    np.testing.assert_allclose(g, np.exp(-1.0), rtol=1e-4)


def test_adams_step_size_option_and_unknown_method():
    ys, _ = odeint(
        lambda t, y: -y, jnp.ones(1), [0.0, 1.0], method="explicit_adams",
        options={"step_size": 0.05},
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=1e-5)
    with pytest.raises(ValueError, match="multistep"):
        odeint(lambda t, y: -y, jnp.ones(1), [0.0, 1.0], method="adams_nope")


def test_dop853_linear_and_oscillator():
    """Hairer's DOP853 (scipy-published coefficients, dual 5th/3rd error)."""
    ys, st = odeint(
        lambda t, y: -y, jnp.ones(3), [0.0, 1.0], rtol=1e-6, atol=1e-8,
        method="dop853",
    )
    np.testing.assert_allclose(ys[-1], np.exp(-1.0), rtol=5e-6)  # f32 floor
    assert bool(st.succeeded) and int(st.n_rejected) == 0
    # 13-stage FSAL: nfe = 2 (init) + 12 * attempts
    assert int(st.n_func_evals) == 2 + 12 * (int(st.n_accepted) + int(st.n_rejected))

    def rhs(t, y):
        return jnp.stack([y[1], -y[0] * (1.0 + 0.5 * jnp.sin(3.0 * t))])

    y_ref, _ = odeint(rhs, jnp.asarray([1.0, 0.0]), [0.0, 10.0], rtol=1e-7, atol=1e-9)
    y8, _ = odeint(
        rhs, jnp.asarray([1.0, 0.0]), [0.0, 10.0], rtol=1e-6, atol=1e-8,
        method="dop853",
    )
    np.testing.assert_allclose(y8[-1], y_ref[-1], rtol=1e-4, atol=1e-5)


def test_dop853_lands_exactly_on_output_times():
    """clip_steps semantics: each requested time is hit by assignment, so
    output accuracy is the method's own order (no quartic-interp ceiling),
    and f32 rounding cannot produce ulp-sized trailing steps."""
    ts = [0.0, 0.37, 0.61, 1.0]
    ys, st = odeint(
        lambda t, y: y * jnp.cos(t), jnp.ones(1), ts, rtol=1e-7, atol=1e-9,
        method="dop853",
    )
    np.testing.assert_allclose(
        ys[:, 0], np.exp(np.sin(np.asarray(ts))), rtol=1e-6
    )
    assert bool(st.succeeded)


def test_dop853_backward_grid():
    ys, _ = odeint(
        lambda t, y: y, jnp.full((2,), 2.0), [1.0, 0.0], rtol=1e-7,
        atol=1e-9, method="dop853",
    )
    np.testing.assert_allclose(ys[-1], 2.0 * np.exp(-1.0), rtol=5e-6)  # f32 floor


def test_dop853_more_accurate_than_dopri5_at_equal_tolerance():
    """The 8th-order pair's raison d'etre: at equal rtol it lands much
    closer to the true solution than dopri5 (measured ~17x on the bench
    field; assert a conservative margin on a closed-form problem)."""
    def rhs(t, y):
        return -y * (1.0 + 0.3 * jnp.sin(5.0 * t))

    y0 = jnp.ones(4)
    exact = np.exp(-(1.0 + 0.3 * (1 - np.cos(5.0)) / 5.0))  # int_0^1 rhs
    e5 = abs(float(odeint(rhs, y0, [0.0, 1.0], rtol=1e-4, atol=1e-6)[0][-1][0]) - exact)
    e8 = abs(float(odeint(rhs, y0, [0.0, 1.0], rtol=1e-4, atol=1e-6, method="dop853")[0][-1][0]) - exact)
    assert e8 < 0.6 * e5, (e5, e8)


def test_dop853_nan_rhs_is_not_silently_accepted():
    """A NaN in the dual error norm must reject (shrink), not accept with
    ratio 0 — regression for the dual-norm NaN routing."""
    def rhs(t, y):
        return jnp.where(t > 0.3, jnp.nan, -y)

    ys, st = odeint(
        rhs, jnp.ones(2), [0.0, 1.0], rtol=1e-6, atol=1e-8, method="dop853",
        options={"max_num_steps": 200},
    )
    assert not bool(st.succeeded)
    assert int(st.n_rejected) > 0


@pytest.mark.slow
def test_dop853_output_grid_does_not_reset_step_scale():
    """After an exact landing the next interval resumes from the pre-clip
    proposal, so a denser output grid costs at most ~one extra step per
    output point, not a from-scratch regrowth."""
    rhs = lambda t, y: -y
    _, st2 = odeint(rhs, jnp.ones(1), [0.0, 1.0], rtol=1e-6, atol=1e-8, method="dop853")
    ts = list(np.linspace(0.0, 1.0, 11))
    ys, st11 = odeint(rhs, jnp.ones(1), ts, rtol=1e-6, atol=1e-8, method="dop853")
    np.testing.assert_allclose(ys[:, 0], np.exp(-np.asarray(ts)), rtol=5e-6)
    # 9 extra outputs cost at most ~one forced step each
    assert int(st11.n_accepted) <= int(st2.n_accepted) + 11


def test_euler_maruyama_progress_bar_ticks():
    """progress=True drives a host tqdm via jax.debug.callback (the
    reference's sample_sde bar); must work repeatedly on backends with
    callback support (CPU here) and never alter results."""
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((8, 2))
    args = dict(t0=1.0, t1=0.0, steps=5)
    r_quiet = euler_maruyama(key, lambda t, x: -x, lambda t, x: jnp.zeros_like(x), x0, **args)
    for _ in range(2):  # bar must reset between runs
        r_bar = euler_maruyama(
            key, lambda t, x: -x, lambda t, x: jnp.zeros_like(x), x0,
            progress=True, **args,
        )
    np.testing.assert_array_equal(np.asarray(r_bar.x), np.asarray(r_quiet.x))


def test_all_rejected_solve_returns_honest_fallback_not_nan():
    """A RHS that is NaN from the first attempt: every step rejects, the
    loop exhausts max_num_steps, and the output must be the honest
    fallback y0 with succeeded=False — NOT NaN from interpolating the
    zero-width [t0, t1] span (regression)."""
    y0 = jnp.ones((4,))

    def bad_rhs(t, y):
        return jnp.full_like(y, jnp.nan)

    ys, stats = odeint(
        bad_rhs, y0, [0.0, 1.0], rtol=1e-5, atol=1e-5,
        options={"max_num_steps": 16},
    )
    assert not bool(stats.succeeded)
    np.testing.assert_array_equal(np.asarray(ys[-1]), np.asarray(y0))


def test_beta_without_pi_controller_raises():
    """options={'beta': ...} only means something to the PI controller;
    with the default I controller it must raise, not be silently
    swallowed."""
    y0 = jnp.ones((2,))
    f = lambda t, y: -y
    with pytest.raises(ValueError, match="controller"):
        odeint(f, y0, [0.0, 1.0], options={"beta": 0.08})
    # and with the PI controller it is accepted
    ys, stats = odeint(
        f, y0, [0.0, 1.0], options={"controller": "pi", "beta": 0.08}
    )
    assert bool(stats.succeeded)


def test_euler_maruyama_bf16_state_times_stay_accurate():
    """The solver time grid is precomputed in float32 even for bf16 state
    (regression: t accumulated in x0.dtype quantized to ~0.4%/step)."""
    seen = []

    def drift(t, x):
        seen.append(t)
        return -x * 0.0

    res = euler_maruyama(
        jax.random.PRNGKey(0), drift, lambda t, x: jnp.zeros_like(x),
        jnp.ones((4, 2), jnp.bfloat16), t0=1.0, t1=0.0, steps=100,
    )
    # times are traced f32 scalars, not bf16
    assert seen[0].dtype == jnp.float32
    assert res.x.dtype == jnp.bfloat16


def test_euler_maruyama_inactive_nan_not_flagged():
    """NaNs produced on steps below epsilon (whose results are discarded)
    must not set nan_encountered (regression)."""

    def drift(t, x):
        # finite above epsilon, NaN below (like sigma(t) -> 0 blowups)
        return jnp.where(t >= 0.5, -x, jnp.nan)

    res = euler_maruyama(
        jax.random.PRNGKey(0), drift, lambda t, x: jnp.zeros_like(x),
        jnp.ones((4, 2)), t0=1.0, t1=0.0, steps=10, epsilon=0.5,
    )
    assert not bool(res.nan_encountered)
    assert bool(jnp.all(jnp.isfinite(res.x_mean)))
    # ... while an ACTIVE NaN still flags
    res2 = euler_maruyama(
        jax.random.PRNGKey(0), lambda t, x: jnp.full_like(x, jnp.nan),
        lambda t, x: jnp.zeros_like(x),
        jnp.ones((4, 2)), t0=1.0, t1=0.0, steps=10,
    )
    assert bool(res2.nan_encountered)


def test_odeint_fixed_rejects_bad_substeps():
    with pytest.raises(ValueError, match="steps_per_interval"):
        odeint(lambda t, y: -y, jnp.ones(2), [0.0, 1.0], method="euler",
               options={"steps_per_interval": 0})
