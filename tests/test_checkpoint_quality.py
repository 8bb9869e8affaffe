"""Statistical + solver-parity regression gates on the COMMITTED flagship
checkpoint (benchmarks/flagship_ckpt.npz).

Round-2 VERDICT "What's weak" #5: the only end-to-end statistical gate was
test_end_to_end.py's 5% bar, ~30x looser than what the framework actually
achieves — a 3x statistical-quality regression would have passed every
tier.  These tests pin the achieved level on a fixed, committed artifact,
so the gate is deterministic (no training in the test) and a regression
in either the checkpoint pipeline (benchmarks/make_flagship_ckpt.py) or
the likelihood solvers fails loudly.

Two gates:
  * density quality: relative error of the summed log-density vs the
    analytic GMM (the reference's own validation, demo_diffusion.ipynb
    cells 13-17) on a held-out draw;
  * parity modes: the measured strict-parity claim (BENCHMARKS.md
    "north star") — dopri5 @ 3e-6, dopri5 @ 1e-6, tsit5 @ 1e-6 and
    dop853 @ 1e-5 (PI controller) stay within mean <= ~1e-4 / max
    <= 5e-4 of the f64@1e-8 oracle on THIS committed field (measured
    2026-08-20: dopri5@1e-6 2.9e-5 / 1.2e-4 at 266 RHS evals; tsit5@1e-6
    7.5e-6 / 3.3e-5 at 344; dop853@1e-5 2.6e-5 / 1.0e-4 at 410 — while
    dopri5@3e-6 is borderline: mean 8.7e-5 or 1.5e-4 depending on the
    64-row eval draw, so it carries no strict claim).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oracles import (
    numpy_dopri5,
    vesde_likelihood_rhs_f64,
    vesde_prior_logprob_f64,
)

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "flagship_ckpt.npz",
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(CKPT),
        reason="committed flagship checkpoint absent",
    ),
]


@pytest.fixture(scope="module")
def flagship():
    from bench import build_trained_model

    model, x, (shift, scale) = build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    assert os.path.exists(CKPT)
    return model, shift, scale


def test_flagship_density_quality(flagship):
    """Relative density error vs the analytic mixture stays at the level
    the committed artifact achieved at save time (recorded in its
    metadata) — the end-to-end statistical regression gate."""
    from flowfusion_tpu.utils.checkpoint import read_npz_extra
    from flowfusion_tpu.utils.data import DEMO_GMM

    model, shift, scale = flagship
    extra = read_npz_extra(CKPT)
    saved_err = extra["density_rel_error_exact_1e-4"]

    n_eval = 25_000
    x_raw = DEMO_GMM.sample(jax.random.PRNGKey(99), n_eval)
    x_std = (x_raw - shift) / scale
    lp_std, _ = jax.jit(
        lambda m, xx: m.log_prob(xx, atol=1e-4, rtol=1e-4)
    )(model, x_std)
    lp_data = lp_std - jnp.sum(jnp.log(scale))
    total = float(jnp.sum(lp_data))
    truth = float(jnp.sum(DEMO_GMM.log_prob(x_raw)))
    rel = abs(total - truth) / abs(truth)

    # The absolute gate (tightened 1% -> 0.3% in round 4, VERDICT item
    # 8): the committed artifact records 0.157% held-out / ~0.21% on
    # fresh draws of the (deliberately hard) DEMO_GMM, so 0.3% holds
    # with ~1.4x margin while still catching any real protocol
    # regression.
    assert rel <= 3e-3, f"density error {rel:.4%} regressed past 0.3%"
    # The relative gate: within 2x of what this artifact achieved at
    # save time (different eval draw + half the rows => some noise, but
    # the save-time two-draw spread was <6% relative).
    assert rel <= 2.0 * saved_err + 5e-4, (rel, saved_err)


def test_flagship_parity_modes(flagship):
    """dop853@1e-5 and tsit5@1e-6 (PI) meet the strict density-parity bar
    vs the f64@1e-8 oracle on the committed field; dopri5@1e-6 meets the
    mean bar.  This is the measured version of the BENCHMARKS.md parity
    claim, pinned to the committed artifact."""
    model, _, _ = flagship
    from flowfusion_tpu.utils.data import DEMO_GMM

    m = dataclasses.replace(model, trace_mode="exact", use_fused_kernel=False)
    xs = jnp.asarray(
        DEMO_GMM.sample(jax.random.PRNGKey(5), 64), jnp.float32
    )
    # standardize with the checkpoint stats so the field matches training
    from flowfusion_tpu.utils.checkpoint import read_npz_extra

    extra = read_npz_extra(CKPT)
    xs = (xs - jnp.asarray(extra["shift"])) / jnp.asarray(extra["scale"])

    B, D = xs.shape
    rhs = vesde_likelihood_rhs_f64(m.params)(D)
    y0 = np.concatenate([np.asarray(xs, np.float64).ravel(), np.zeros(B)])
    ys, _ = numpy_dopri5(
        rhs, y0, [float(m.sde.epsilon), 1.0], 1e-8, 1e-8
    )
    yT = ys[-1]
    truth = yT[B * D :] + vesde_prior_logprob_f64(yT[: B * D].reshape(B, D))

    def solve(method, tol, opts):
        lp, st = jax.jit(
            lambda mm, xx: mm.log_prob(
                xx, atol=tol, rtol=tol, method=method, options=opts
            )
        )(m, xs)
        return np.asarray(lp, np.float64), int(st.n_func_evals)

    lp_853, nfe_853 = solve("dop853", 1e-5, {"controller": "pi", "beta": 0.04})
    err = np.abs(lp_853 - truth)
    assert err.mean() <= 1e-4, err.mean()
    assert err.max() <= 5e-4, err.max()

    lp_t5, nfe_t5 = solve("tsit5", 1e-6, {"controller": "pi"})
    err = np.abs(lp_t5 - truth)
    assert err.mean() <= 1e-4, err.mean()
    assert err.max() <= 5e-4, err.max()

    lp_45, nfe_45 = solve("dopri5", 1e-6, {"controller": "pi"})
    err = np.abs(lp_45 - truth)
    assert err.mean() <= 1e-4, err.mean()
    assert err.max() <= 5e-4, err.max()

    # the cheapest ROBUSTLY-strict mode (measured on four independent
    # 64-row draws: worst mean 6.2e-5, worst max 3.9e-4 at ~256 evals) —
    # the single-chip >=1e6 evals/s strict claim rides on it
    lp_15, nfe_15 = solve("dopri5", 1.5e-6, {"controller": "pi"})
    err = np.abs(lp_15 - truth)
    assert err.mean() <= 1e-4, err.mean()
    assert err.max() <= 5e-4, err.max()
    assert nfe_15 <= 330, nfe_15

    # dopri5 @ 3e-6 is BORDERLINE, not strict: its mean |dlogp| lands on
    # either side of 1e-4 depending on the eval draw (measured 8.7e-5 on
    # one 64-row draw, 1.5e-4 on another) — pinned here at the relaxed
    # band so the docs' "borderline" label stays measured.
    lp_45c, nfe_45c = solve("dopri5", 3e-6, {"controller": "pi"})
    err = np.abs(lp_45c - truth)
    assert err.mean() <= 3e-4, err.mean()
    assert err.max() <= 1.5e-3, err.max()

    # the measured eval budgets stay in their recorded bands (solver or
    # controller regressions show up here as step-count inflation)
    assert nfe_853 <= 550, nfe_853
    assert nfe_t5 <= 450, nfe_t5
    assert nfe_45 <= 360, nfe_45
    assert nfe_45c <= 300, nfe_45c


# ---------------------------------------------------------------------------
# conditional flagship gates (round 5 — BASELINE configs[4])
# ---------------------------------------------------------------------------

COND_CKPT = os.path.join(
    os.path.dirname(CKPT), "conditional_ckpt.npz"
)


@pytest.fixture(scope="module")
def conditional():
    if not os.path.exists(COND_CKPT):
        pytest.skip("committed conditional checkpoint absent")
    from benchmarks.make_conditional_ckpt import load_conditional_model

    return load_conditional_model()


def test_conditional_checkpoint_quality(conditional):
    """The committed conditional field's density quality vs the analytic
    family stays at its save-time level under the BASELINE serving
    protocol (hutch@1e-5 PI): measured offset -0.011 nats / scatter 0.20
    at save time — gate at |offset| <= 0.04 and scatter <= 0.30."""
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    model, extra = conditional
    theta, c = CONDITIONAL_POP.sample(jax.random.PRNGKey(9), 20_000)
    lp, _ = jax.jit(
        lambda m, th, cc, kk: m.log_prob(
            th, conditional=cc, key=kk, atol=1e-5, rtol=1e-5,
            volume_corrected=True, options={"controller": "pi"},
        )
    )(model, theta, c, jax.random.PRNGKey(1))
    truth = CONDITIONAL_POP.log_prob(theta, c)
    bias = float(jnp.mean(lp - truth))
    rmse = float(jnp.sqrt(jnp.mean((lp - truth - bias) ** 2)))
    assert abs(bias) <= 0.04, f"offset {bias:+.4f} nats regressed"
    assert rmse <= 0.30, f"scatter {rmse:.4f} nats regressed"
    # within 2x of the save-time figures recorded in the artifact
    assert abs(bias) <= 2.0 * abs(extra["offset_nats_hutch_1e-5"]) + 0.02


def test_conditional_checkpoint_strict_mode(conditional):
    """The measured strict cells for the committed conditional field
    (benchmarks/conditional_frontier.json, 600-epoch/stage protocol):
    exact-trace dop853@3e-6 PI is ROBUSTLY strict (4-draw worst mean
    3.6e-5 / max 3.2e-4 at NFE 1094); tsit5@1e-6 is borderline (worst
    mean 1.02e-4 straddles the bar by draw — same phenomenon as
    dopri5@3e-6 on the 2-D flagship).  Gate both at the contract bars
    with one-draw slack (mean <= 1.2e-4 / max <= 6e-4) plus NFE bands."""
    from oracles import (
        numpy_dopri5,
        std_normal_logprob_f64,
        vpsde_cond_likelihood_rhs_f64,
    )
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    model, _ = conditional
    inner = dataclasses.replace(
        model.score_model, trace_mode="exact", use_fused_kernel=False
    )
    theta, c = CONDITIONAL_POP.sample(jax.random.PRNGKey(100), 64)
    x_std = np.asarray((theta - model.shift) / model.scale, np.float64)
    cond_n = np.asarray(model._norm_cond(c), np.float64)

    B, D = x_std.shape
    sde = inner.sde
    rhs = vpsde_cond_likelihood_rhs_f64(
        inner.params, cond_n,
        beta_min=sde.beta_min, beta_max=sde.beta_max, T=sde.T,
    )(D)
    y0 = np.concatenate([x_std.ravel(), np.zeros(B)])
    ys, _ = numpy_dopri5(rhs, y0, [float(sde.epsilon), 1.0], 1e-8, 1e-8)
    yT = ys[-1]
    truth = yT[B * D:] + std_normal_logprob_f64(yT[: B * D].reshape(B, D))

    xs32 = jnp.asarray(x_std, jnp.float32)
    cs32 = jnp.asarray(cond_n, jnp.float32)

    # robust strict cell: dop853@3e-6 (4-draw worst 3.6e-5 / 3.2e-4)
    lp, st = jax.jit(
        lambda m, xx, cc: m.log_prob(
            xx, conditional=cc, atol=3e-6, rtol=3e-6, method="dop853",
            options={"controller": "pi", "beta": 0.04},
        )
    )(inner, xs32, cs32)
    err = np.abs(np.asarray(lp, np.float64) - truth)
    assert err.mean() <= 1.2e-4, err.mean()
    assert err.max() <= 6e-4, err.max()
    assert int(np.max(np.asarray(st.n_func_evals))) <= 1250  # measured 1094

    # borderline cell stays measured: tsit5@1e-6 (worst 1.02e-4)
    lp_t, st_t = jax.jit(
        lambda m, xx, cc: m.log_prob(
            xx, conditional=cc, atol=1e-6, rtol=1e-6, method="tsit5",
            options={"controller": "pi"},
        )
    )(inner, xs32, cs32)
    err_t = np.abs(np.asarray(lp_t, np.float64) - truth)
    assert err_t.mean() <= 1.5e-4, err_t.mean()
    assert err_t.max() <= 6e-4, err_t.max()
    assert int(np.max(np.asarray(st_t.n_func_evals))) <= 900  # measured 758

    # The stiffness pin: dopri5@1e-5 (the BASELINE protocol's step
    # counts) has measured solver error mean ~2.6e-3 on this field —
    # catch a solver regression OR a silently-roughened retrained field.
    lp5, st5 = jax.jit(
        lambda m, xx, cc: m.log_prob(
            xx, conditional=cc, atol=1e-5, rtol=1e-5,
            options={"controller": "pi"},
        )
    )(inner, xs32, cs32)
    err5 = np.abs(np.asarray(lp5, np.float64) - truth)
    assert err5.mean() <= 1.5e-2, err5.mean()
    assert int(np.max(np.asarray(st5.n_func_evals))) <= 360  # measured 284


# ---------------------------------------------------------------------------
# flow + symplectic committed-field gates (round 5)
# ---------------------------------------------------------------------------

FLOW_CKPT = os.path.join(os.path.dirname(CKPT), "flow_ckpt.npz")
SYM_CKPT = os.path.join(os.path.dirname(CKPT), "symplectic_ckpt.npz")


def test_flow_checkpoint_strict_modes():
    """The committed flow field's measured strict claim
    (benchmarks/flow_sym_frontier.json): exact-trace dopri5 is strict
    from 1e-5 down (worst mean 2.7e-5 @1e-5, 4.4e-6 @1.5e-6) at NFE
    74/92 — the family's 3.08M/2.12M evals/s strict_1m rows ride on
    these cells."""
    if not os.path.exists(FLOW_CKPT):
        pytest.skip("committed flow checkpoint absent")
    from oracles import (
        flow_likelihood_rhs_f64,
        numpy_dopri5,
        std_normal_logprob_f64,
    )
    from benchmarks.make_flow_symplectic_ckpts import load_flow_model
    from flowfusion_tpu.utils.data import REFERENCE_GMM

    flow, extra = load_flow_model()
    # training-quality gate (demo protocol): saved 0.179%, gate 0.3%
    assert extra["density_rel_error_exact_1e-4"] <= 3e-3

    flow = dataclasses.replace(
        flow, trace_mode="exact", use_fused_kernel=False
    )
    x = REFERENCE_GMM.sample(jax.random.PRNGKey(200), 64)
    x_std = (np.asarray(x, np.float64) - np.asarray(flow.target_shift)) / (
        np.asarray(flow.target_scale)
    )
    B, D = x_std.shape
    rhs = flow_likelihood_rhs_f64(flow.params)(D)
    y0 = np.concatenate([x_std.ravel(), np.zeros(B)])
    ys, _ = numpy_dopri5(rhs, y0, [0.0, 1.0], 1e-8, 1e-8)
    yT = ys[-1]
    truth = (
        std_normal_logprob_f64(yT[: B * D].reshape(B, D)) + yT[B * D:]
        - np.sum(np.log(np.asarray(flow.target_scale, np.float64)))
    )

    for tol, nfe_cap in ((1e-5, 100), (1.5e-6, 120)):
        lp, st = jax.jit(
            lambda m, xx, tol=tol: m.log_prob(
                xx, atol=tol, rtol=tol, options={"controller": "pi"}
            )
        )(flow, jnp.asarray(x, jnp.float32))
        err = np.abs(np.asarray(lp, np.float64) - truth)
        assert err.mean() <= 1.2e-4, (tol, err.mean())
        assert err.max() <= 6e-4, (tol, err.max())
        assert int(np.max(np.asarray(st.n_func_evals))) <= nfe_cap


def test_symplectic_checkpoint_solver_accuracy():
    """The committed symplectic field's likelihood tracks the
    matched-momentum-draw f64 oracle (solver accuracy — the trace-free
    likelihood has no estimator axis; the IWAE bound gap vs the mixture
    is a model property recorded in the artifact meta, not gated here).

    Measured frontier (flow_sym_frontier.json): dopri5 hits an f32
    accuracy floor ~2.6e-4 at 1e-6 and goes strict at 1e-7 (worst mean
    1.7e-5 / max 6.2e-5, NFE 176); dop853@1e-5 is also strict (6.6e-5).
    The gate pins the 1e-7 strict cell."""
    if not os.path.exists(SYM_CKPT):
        pytest.skip("committed symplectic checkpoint absent")
    from oracles import (
        numpy_dopri5,
        std_normal_logprob_f64,
        symplectic_rhs_f64,
    )
    from benchmarks.make_flow_symplectic_ckpts import load_symplectic_model
    from flowfusion_tpu.utils.data import DEMO_GMM

    model, _ = load_symplectic_model()
    model = dataclasses.replace(model, use_fused_kernel=False)
    x = DEMO_GMM.sample(jax.random.PRNGKey(400), 64)
    k_lp = jax.random.PRNGKey(80)
    q0 = (np.asarray(x, np.float64) - np.asarray(model.shift)) / np.asarray(
        model.scale
    )
    p0 = np.asarray(
        jax.random.normal(k_lp, q0.shape, jnp.float32), np.float64
    )
    B, D = q0.shape
    rhs = symplectic_rhs_f64(model.params)(D)
    y0 = np.concatenate([q0, p0], axis=1).ravel()
    ys, _ = numpy_dopri5(rhs, y0, [0.0, 1.0], 1e-9, 1e-9)
    z1 = ys[-1].reshape(B, 2 * D)
    truth = (
        std_normal_logprob_f64(z1)
        - std_normal_logprob_f64(p0)
        - np.sum(np.log(np.asarray(model.scale, np.float64)))
    )

    lp, st = jax.jit(
        lambda m, kk, xx: m.log_prob(
            kk, xx, atol=1e-7, rtol=1e-7, options={"controller": "pi"}
        )
    )(model, k_lp, jnp.asarray(x, jnp.float32))
    err = np.abs(np.asarray(lp, np.float64) - truth)
    assert err.mean() <= 1.2e-4, err.mean()
    assert err.max() <= 6e-4, err.max()
    assert int(np.max(np.asarray(st.n_func_evals))) <= 220  # measured 176

    # the f32 floor pin: 1e-5 solves sit at ~6-7e-4 mean on this field
    # (NOT strict — the 8M/s strict_1m row at 1e-5 carries no strict
    # label); catch silent floor regressions
    lp5, _ = jax.jit(
        lambda m, kk, xx: m.log_prob(
            kk, xx, atol=1e-5, rtol=1e-5, options={"controller": "pi"}
        )
    )(model, k_lp, jnp.asarray(x, jnp.float32))
    err5 = np.abs(np.asarray(lp5, np.float64) - truth)
    assert err5.mean() <= 2e-3, err5.mean()
