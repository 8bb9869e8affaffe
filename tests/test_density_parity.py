"""Equal-tolerance density-parity contract on a trained score field.

The parity bar (SURVEY.md §6): densities from the f32 TPU solver must
track a float64 same-convention solve of the same field.  This battery
trains the bench configuration briefly (2-D GMM, VESDE, MLP[128,128,128])
and compares `ScoreModel.log_prob` with exact trace against the
independent numpy float64 oracle (oracles.py: same dopri5 tableau, norm,
controller, Hairer init).

Findings this test pins (see BENCHMARKS.md "Solver accuracy frontier"):
  * at rtol=atol=1e-5 the *truncation* error of ANY same-tolerance solve
    dominates: the f64 oracle at 1e-5 itself sits ~5e-3 from a 1e-8
    ground truth on this field, so "<=1e-5 agreement between two 1e-5
    solves" is not a meaningful contract for dopri5;
  * f32 dopri5 @1e-5 adds no material error beyond that truncation
    scatter (it lands *within* the f64@1e-5 envelope of ground truth);
  * dop853 @1e-5 in f32 is the documented parity mode: mean |dlogp|
    vs the f64 1e-8 ground truth ~4e-5 (<=1e-4 asserted), ~50x closer
    than dopri5 at the same nominal tolerance.
"""

import dataclasses

import numpy as np
import jax
import pytest

from oracles import (
    numpy_dopri5,
    vesde_likelihood_rhs_f64,
    vesde_prior_logprob_f64,
)


@pytest.fixture(scope="module")
def trained_field():
    from bench import build_trained_model

    model, x, _ = build_trained_model(jax.random.PRNGKey(0), steps=200, batch=1024)
    model = dataclasses.replace(model, trace_mode="exact", use_fused_kernel=False)
    return model, x[:64]


def _solve_oracle(model, xt, tol):
    B, D = xt.shape
    rhs = vesde_likelihood_rhs_f64(model.params)(D)
    y0 = np.concatenate([np.asarray(xt, np.float64).ravel(), np.zeros(B)])
    ys, nsteps = numpy_dopri5(rhs, y0, [float(model.sde.epsilon), 1.0], tol, tol)
    yT = ys[-1]
    XT = yT[: B * D].reshape(B, D)
    lp = yT[B * D :] + vesde_prior_logprob_f64(XT)
    return lp, nsteps


def _solve_f32(model, xt, method):
    # jit pins the solve to the unrouted single-device path (eager calls
    # autoshard over the 8-device CPU mesh -> per-shard error norms)
    lp, st = jax.jit(
        lambda m, xx: m.log_prob(
            xx, atol=1e-5, rtol=1e-5, method=method, options={"min_step": 0.0}
        )
    )(model, xt)
    return np.asarray(lp, np.float64), int(st.n_func_evals)


@pytest.mark.slow
def test_density_parity_contract_trained_field(trained_field):
    model, xt = trained_field
    truth, _ = _solve_oracle(model, xt, 1e-8)

    lp_45, nfe_45 = _solve_f32(model, xt, "dopri5")
    lp_853, _ = _solve_f32(model, xt, "dop853")
    o5, o5_steps = _solve_oracle(model, xt, 1e-5)

    err_45 = np.abs(lp_45 - truth)
    err_853 = np.abs(lp_853 - truth)
    err_o5 = np.abs(o5 - truth)

    # dop853 is the parity mode: mean <=1e-4 vs ground truth at rtol=1e-5
    # (measured ~4e-5), and >=10x closer than same-tolerance dopri5.
    assert err_853.mean() <= 1e-4, err_853.mean()
    assert err_853.max() <= 5e-4, err_853.max()
    assert err_853.mean() * 10 <= err_45.mean()

    # f32 dopri5 stays inside the truncation envelope: no worse than 3x
    # the f64 same-tolerance solve's own distance from ground truth.
    assert err_45.mean() <= 3.0 * err_o5.mean() + 1e-4, (
        err_45.mean(),
        err_o5.mean(),
    )

    # equal-convention check: same controller => comparable accepted-step
    # budget (f32 nfe counts rejected steps too, hence the loose band).
    assert 0.5 <= (nfe_45 / 6) / o5_steps <= 2.0, (nfe_45, o5_steps)


@pytest.mark.slow
def test_oracle_self_consistency(trained_field):
    """The f64 oracle converges on this field: tightening the tolerance
    from 1e-5 to 1e-8 moves log-probs by the truncation scale (>>1e-5),
    while 1e-8 vs 1e-9 agree to ~1e-4 — i.e. 1e-8 is a valid ground
    truth for the 1e-4-level assertions above."""
    model, xt = trained_field
    o8, _ = _solve_oracle(model, xt, 1e-8)
    o9, _ = _solve_oracle(model, xt, 1e-9)
    assert np.abs(o8 - o9).mean() <= 1e-4
