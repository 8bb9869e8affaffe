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


@pytest.fixture(scope="module")
def trained_flow_field():
    import jax.numpy as jnp
    import optax

    from flowfusion_tpu.models.flow import ODEFlow
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    k_data, k_net, k_train = jax.random.split(jax.random.PRNGKey(3), 3)
    x_raw = DEMO_GMM.sample(k_data, 4096)
    shift, scale = standardization_stats(x_raw)
    flow = ODEFlow.create(
        k_net, target_dimension=2, hidden_units=(128, 128),
        target_shift=shift, target_scale=scale,
    )
    tx = optax.adam(1e-3)

    def step(carry, k):
        params, opt = carry
        kb, kl = jax.random.split(k)
        idx = jax.random.randint(kb, (512,), 0, x_raw.shape[0])

        def loss_fn(p):
            return dataclasses.replace(flow, params=p).flow_matching_loss(
                kl, x_raw[idx]
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt), loss

    (params, _), _ = jax.lax.scan(
        step, (flow.params, tx.init(flow.params)),
        jax.random.split(k_train, 200),
    )
    flow = dataclasses.replace(flow, params=params, use_fused_kernel=False)
    return flow, x_raw[:64]


def _flow_solve_oracle(flow, x, tol):
    from oracles import (
        flow_likelihood_rhs_f64,
        numpy_dopri5,
        std_normal_logprob_f64,
    )

    x_std = (np.asarray(x, np.float64) - np.asarray(flow.target_shift)) / (
        np.asarray(flow.target_scale)
    )
    B, D = x_std.shape
    rhs = flow_likelihood_rhs_f64(flow.params)(D)
    y0 = np.concatenate([x_std.ravel(), np.zeros(B)])
    ys, nsteps = numpy_dopri5(rhs, y0, [0.0, 1.0], tol, tol)
    yT = ys[-1]
    XT = yT[: B * D].reshape(B, D)
    lp = (
        std_normal_logprob_f64(XT)
        + yT[B * D :]
        - np.sum(np.log(np.asarray(flow.target_scale, np.float64)))
    )
    return lp, nsteps


@pytest.mark.slow
def test_flow_density_parity_contract(trained_flow_field):
    """The density-parity contract extends to the flow module: the f32
    exact-trace ODEFlow.log_prob tracks the float64 same-convention
    oracle of the same trained velocity field (dop853 as parity mode,
    dopri5 within the truncation envelope — same findings as the
    diffusion battery above)."""
    flow, xt = trained_flow_field
    truth, _ = _flow_solve_oracle(flow, xt, 1e-8)

    solve = lambda method: jax.jit(
        lambda m, xx: m.log_prob(xx, atol=1e-5, rtol=1e-5, method=method)
    )(flow, xt)
    lp_45, _ = solve("dopri5")
    lp_853, _ = solve("dop853")
    o5, _ = _flow_solve_oracle(flow, xt, 1e-5)

    err_45 = np.abs(np.asarray(lp_45, np.float64) - truth)
    err_853 = np.abs(np.asarray(lp_853, np.float64) - truth)
    err_o5 = np.abs(o5 - truth)

    assert err_853.mean() <= 1e-4, err_853.mean()
    assert err_45.mean() <= 3.0 * err_o5.mean() + 1e-4, (
        err_45.mean(),
        err_o5.mean(),
    )


@pytest.mark.slow
def test_symplectic_density_parity_contract():
    """Trace-free likelihood vs a float64 oracle of the same field and
    the SAME momentum draw: integrate the joint (q, p) state in f64 and
    reproduce lp = log N(z1) - log N(p0) - sum(log scale).  Completes
    the oracle trilogy (diffusion + flow above)."""
    import jax.numpy as jnp

    from oracles import numpy_dopri5, std_normal_logprob_f64, symplectic_rhs_f64
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    k_data, k_net, k_lp = jax.random.split(jax.random.PRNGKey(5), 3)
    x = DEMO_GMM.sample(k_data, 64)
    shift, scale = standardization_stats(x)
    model = SymplecticFlowModel.create(
        k_net, n_data_dims=2, units=(128,), shift=shift, scale=scale,
        use_fused_kernel=False,
    )

    lp_f32, _ = jax.jit(
        lambda m, xx, kk: m.log_prob(kk, xx, atol=1e-7, rtol=1e-7)
    )(model, x, k_lp)

    # the oracle must see the exact p0 the model drew
    q0 = (np.asarray(x, np.float64) - np.asarray(shift)) / np.asarray(scale)
    p0 = np.asarray(
        jax.random.normal(k_lp, q0.shape, jnp.float32), np.float64
    )
    B, D = q0.shape
    rhs = symplectic_rhs_f64(model.params)(D)
    y0 = np.concatenate([q0, p0], axis=1).ravel()
    ys, _ = numpy_dopri5(rhs, y0, [0.0, 1.0], 1e-9, 1e-9)
    z1 = ys[-1].reshape(B, 2 * D)
    lp_oracle = (
        std_normal_logprob_f64(z1)
        - std_normal_logprob_f64(p0)
        - np.sum(np.log(np.asarray(scale, np.float64)))
    )
    err = np.abs(np.asarray(lp_f32, np.float64) - lp_oracle)
    assert err.mean() <= 1e-4, err.mean()
    assert err.max() <= 1e-3, err.max()
