"""ScoreModel tests: analytic-score end-to-end likelihood and consistency.

The key oracle: plug the *true* score of a Gaussian data distribution into
the model.  Then the probability-flow ODE transports exactly and
``log_prob`` must reproduce the closed-form Gaussian density — this
exercises the solver + trace estimator + prior assembly with zero training.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops.sde import VESDE, VPSDE


@dataclasses.dataclass(frozen=True)
class AnalyticGaussianScore:
    """True score of data ~ N(0, s0^2 I) diffused by the given SDE.

    Marginal at t: N(0, nu^2 s0^2 + eta^2), score = -x / var(t).
    Demonstrates the pluggable-net protocol (any hashable config with
    .apply), mirroring the reference's 'model is any nn.Module' flexibility.
    """

    sde: object
    s0: float = 1.0

    def apply(self, params, t, x, conditional=None):
        nu, eta = self.sde.marginal_prob_scalars(jnp.asarray(t, jnp.float32))
        var = (nu * self.s0) ** 2 + eta**2
        return -x / var.reshape((-1,) + (1,) * (x.ndim - 1))


def _analytic_model(sde, s0=1.0, **kw):
    return ScoreModel(
        params={}, net=AnalyticGaussianScore(sde=sde, s0=s0), no_sigma=True, sde=sde, **kw
    )


def _gauss_logpdf(x, var):
    return np.sum(-0.5 * x**2 / var - 0.5 * np.log(2 * np.pi * var), axis=-1)


@pytest.mark.parametrize("sde_cls,s0", [(VESDE, 0.5), (VPSDE, 0.5)])
def test_log_prob_matches_analytic_gaussian(sde_cls, s0):
    """With the true Gaussian score the flow is linear and the *model*
    density has a closed form: the probability flow transports zero-mean
    Gaussian marginals by matched quantiles, x(t) = x(eps) sqrt(var(t)/
    var(eps)), so the model's density at t=eps is
    N(0, prior_scale^2 var(eps)/var(T)).  Any deviation is solver error."""
    sde = sde_cls()
    m = _analytic_model(sde, s0=s0)
    x = np.linspace(-1.0, 1.0, 11)[:, None] * np.ones((1, 2))
    lp, stats = m.log_prob(jnp.asarray(x, jnp.float32), atol=1e-6, rtol=1e-6)

    def var_at(t):
        nu, eta = sde.marginal_prob_scalars(jnp.asarray(t))
        return float(nu) ** 2 * s0**2 + float(eta) ** 2

    model_var = sde.prior_scale**2 * var_at(float(sde.epsilon)) / var_at(sde.T)
    expected = _gauss_logpdf(x, model_var)
    np.testing.assert_allclose(lp, expected, atol=2e-3)
    assert bool(np.all(stats.succeeded))


@pytest.mark.parametrize("trace_mode", ["hutchinson", "hutchpp", "xtrace"])
@pytest.mark.slow
def test_stochastic_trace_modes_close_to_exact(trace_mode):
    sde = VPSDE()
    m = _analytic_model(sde, s0=0.7, trace_mode=trace_mode, hpp_rank=2, hpp_vecs=2, xt_vecs=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)) * 0.7, jnp.float32)
    lp, _ = m.log_prob(x, key=jax.random.PRNGKey(0))
    m_exact = _analytic_model(sde, s0=0.7)
    lp_exact, _ = m_exact.log_prob(x)
    # For a linear (Gaussian) flow the Jacobian is isotropic-ish; stochastic
    # estimators have low variance — mean agreement should be tight.
    assert abs(float(jnp.mean(lp - lp_exact))) < 0.05
    np.testing.assert_allclose(lp, lp_exact, atol=0.5)


def test_stochastic_trace_requires_key():
    sde = VPSDE()
    m = _analytic_model(sde, trace_mode="hutchinson")
    with pytest.raises(ValueError):
        m.solve_odes_forward(jnp.ones((2, 2)))


def test_log_prob_input_gradients_match_analytic_score():
    """grad_x log_prob — the downstream-inference path (HMC / MAP over a
    trained population model, the pop-cosmos use case for the reference's
    odeint_adjoint, diffusion.py:733): differentiating log_prob(adjoint=True)
    w.r.t. the *inputs* must reproduce the closed-form model score.

    For the analytic-score model the density is N(0, prior_scale^2
    var(eps)/var(T)) (see test_log_prob_matches_analytic_gaussian), so
    grad_x log p = -x / model_var exactly.
    """
    sde = VPSDE()
    m = _analytic_model(sde, s0=0.8)
    x = jnp.asarray(
        np.linspace(-1.0, 1.0, 5)[:, None] * np.ones((1, 2)), jnp.float32
    )

    def total_lp(xx):
        lp, _ = m.log_prob(xx, atol=1e-6, rtol=1e-6, adjoint=True)
        return jnp.sum(lp)

    g = jax.grad(total_lp)(x)

    def var_at(t):
        nu, eta = sde.marginal_prob_scalars(jnp.asarray(t))
        return float(nu) ** 2 * 0.8**2 + float(eta) ** 2

    model_var = sde.prior_scale**2 * var_at(float(sde.epsilon)) / var_at(sde.T)
    np.testing.assert_allclose(g, -np.asarray(x) / model_var, atol=2e-3)


@pytest.mark.slow
def test_round_trip_sample_then_logprob_shapes():
    key = jax.random.PRNGKey(0)
    cfg = ScoreMLPConfig(n_dimensions=2, units=(32,))
    m = ScoreModel(params=init_score_mlp(key, cfg), net=cfg, sde=VPSDE())
    base = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    x, stats = m.sample_ode_from_base(base)
    assert x.shape == (8, 2) and bool(np.all(stats.succeeded))
    lp, _ = m.log_prob(x)
    assert lp.shape == (8,)


@pytest.mark.slow
def test_ode_forward_backward_inverse():
    """sample_ode_from_base and solve_odes_forward are mutual inverses."""
    sde = VPSDE()
    m = _analytic_model(sde, s0=0.8)
    x0 = jnp.asarray([[0.3, -0.4], [0.9, 0.1]], jnp.float32)
    xT, _, _ = m.solve_odes_forward(x0, atol=1e-7, rtol=1e-7)
    # sample_ode_from_base pre-scales by prior_scale; undo for the inverse.
    x_back, _ = m.sample_ode_from_base(
        xT / m.sde.prior_scale, atol=1e-7, rtol=1e-7
    )
    np.testing.assert_allclose(x_back, x0, atol=2e-4)


def test_conditional_plumbing():
    key = jax.random.PRNGKey(0)
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=1, units=(32,))
    m = ScoreModel(params=init_score_mlp(key, cfg), net=cfg, sde=VPSDE())
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    c1 = jnp.zeros((4, 1))
    c2 = jnp.ones((4, 1))
    lp1, _ = m.log_prob(x, conditional=c1)
    lp2, _ = m.log_prob(x, conditional=c2)
    assert not np.allclose(lp1, lp2)  # conditional must reach the net


def test_sample_sde_statistics_analytic():
    """EM sampling with the true score recovers the data distribution."""
    sde = VESDE()
    m = _analytic_model(sde, s0=1.0)
    res = m.sample_sde(jax.random.PRNGKey(0), (20000, 2), steps=200)
    samples = np.asarray(res.x_mean)
    assert not bool(res.nan_encountered)
    # Data was N(0, 1); EM at 200 steps should land within a few percent.
    np.testing.assert_allclose(np.std(samples), 1.0, atol=0.05)
    np.testing.assert_allclose(np.mean(samples), 0.0, atol=0.05)


def test_dsm_loss_minimized_by_true_score():
    """The DSM loss is (up to noise) minimized at the true score."""
    sde = VPSDE()
    m_true = _analytic_model(sde, s0=1.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 2))  # s0 = 1 data

    @dataclasses.dataclass(frozen=True)
    class Perturbed:
        sde: object
        gain: float

        def apply(self, params, t, x, conditional=None):
            nu, eta = self.sde.marginal_prob_scalars(jnp.asarray(t, jnp.float32))
            var = nu**2 + eta**2
            return -self.gain * x / var.reshape((-1, 1))

    losses = []
    for gain in (0.5, 1.0, 2.0):
        m = ScoreModel(params={}, net=Perturbed(sde=sde, gain=gain), no_sigma=True, sde=sde)
        losses.append(float(m.loss_fn(key, x)))
    assert losses[1] < losses[0] and losses[1] < losses[2]


@pytest.mark.slow
def test_log_prob_per_sample_close_to_batch_global():
    sde = VPSDE()
    m = _analytic_model(sde, s0=0.8)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 2)) * 0.8, jnp.float32)
    lp_global, _ = m.log_prob(x, atol=1e-6, rtol=1e-6)
    lp_per, stats = m.log_prob_per_sample(x, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_per), np.asarray(lp_global), atol=2e-3)
    assert stats.n_accepted.shape == (8,)


@pytest.mark.slow
def test_log_prob_per_sample_hutchinson_conditional():
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=1, units=(32,))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg, sde=VPSDE(),
        trace_mode="hutchinson",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 2))
    c = jnp.linspace(-1, 1, 6)[:, None]
    # jit pins BOTH calls to the unrouted path, so they draw the SAME
    # probes from the key (eager multi-device calls autoshard and fold
    # the key per shard — different probes by design).
    lp, stats = jax.jit(
        lambda mm, xx, cc, kk: mm.log_prob_per_sample(xx, conditional=cc, key=kk)
    )(m, x, c, jax.random.PRNGKey(2))
    lp_g, _ = jax.jit(lambda mm, xx, cc, kk: mm.log_prob(xx, cc, key=kk))(
        m, x, c, jax.random.PRNGKey(2)
    )
    assert lp.shape == (6,)
    # same probes, different stepping: values should be near
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_g), atol=5e-2)


@pytest.mark.parametrize("sde_cls", [VESDE, VPSDE])
def test_dpm_solver_matches_dopri5_samples(sde_cls):
    """DPM-Solver-2 integrates the same probability-flow ODE: per-sample
    endpoints must match the adaptive solve to solver accuracy."""
    sde = sde_cls()
    m = _analytic_model(sde, s0=0.8)
    base = jnp.asarray(np.random.default_rng(1).normal(size=(64, 2)), jnp.float32)
    x_ref, _ = m.sample_ode_from_base(base, atol=1e-6, rtol=1e-6)
    x_dpm = m.sample_dpm(base, steps=48, order=2)
    # second-order convergence verified separately; 48 lambda-steps lands
    # ~5e-3 of the tight adaptive solve on this model
    np.testing.assert_allclose(np.asarray(x_dpm), np.asarray(x_ref), atol=1e-2)


def test_dpm_solver_order1_converges():
    sde = VPSDE()
    m = _analytic_model(sde, s0=0.8)
    base = jnp.asarray(np.random.default_rng(2).normal(size=(16, 2)), jnp.float32)
    x_ref, _ = m.sample_ode_from_base(base, atol=1e-6, rtol=1e-6)
    err = []
    for steps in (8, 32):
        x1 = m.sample_dpm(base, steps=steps, order=1)
        err.append(float(jnp.max(jnp.abs(x1 - x_ref))))
    assert err[1] < err[0]  # refinement reduces error


def test_log_snr_inverse_round_trip():
    from flowfusion_tpu.ops.sde import SUBVPSDE

    for sde in (VESDE(), VPSDE(), SUBVPSDE()):
        t = jnp.linspace(float(sde.epsilon), 1.0, 13)
        lam = sde.log_snr(t)
        t_back = sde.t_of_log_snr(lam)
        np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sample_pc_statistics_analytic():
    """PC sampling with the true score recovers the data distribution,
    and the corrector does not bias the marginals (Song+2021 sampler)."""
    sde = VESDE()
    m = _analytic_model(sde, s0=1.0)
    res = m.sample_pc(
        jax.random.PRNGKey(0), (20000, 2), steps=100, corrector_steps=2
    )
    samples = np.asarray(res.x_mean)
    assert not bool(res.nan_encountered)
    np.testing.assert_allclose(np.std(samples), 1.0, atol=0.05)
    np.testing.assert_allclose(np.mean(samples), 0.0, atol=0.05)


@pytest.mark.slow
def test_sample_pc_zero_corrector_is_plain_em():
    """corrector_steps=0 reduces to the EM update rule: statistics match
    sample_sde at the same step count, and coarse-step corrector runs
    stay unbiased (the Langevin steps target the same marginal — on an
    exact-score field they cannot help, but they must not introduce
    bias)."""
    sde = VESDE()
    m = _analytic_model(sde, s0=1.0)
    res_pc = m.sample_pc(
        jax.random.PRNGKey(0), (20000, 2), steps=50, corrector_steps=0
    )
    res_em = m.sample_sde(jax.random.PRNGKey(1), (20000, 2), steps=50)
    s_pc = float(np.std(np.asarray(res_pc.x_mean)))
    s_em = float(np.std(np.asarray(res_em.x_mean)))
    np.testing.assert_allclose(s_pc, s_em, atol=0.03)

    res_c = m.sample_pc(
        jax.random.PRNGKey(2), (20000, 2), steps=20, corrector_steps=2
    )
    np.testing.assert_allclose(np.mean(np.asarray(res_c.x_mean)), 0.0, atol=0.05)
    np.testing.assert_allclose(np.std(np.asarray(res_c.x_mean)), 1.0, atol=0.07)


def test_fused_dispatch_policy(monkeypatch):
    """The shared dispatch policy (_common.fused_dispatch): explicit
    override wins; auto is single-device-TPU-only; exact-trace on a
    multi-device TPU realm raises loudly instead of building the
    compiler-crashing plain graph; unsupported configs under exact trace
    on TPU raise with estimator advice (round-4: the silent fall-through
    corner is closed — see tests/test_padding.py)."""
    from flowfusion_tpu.models import _common

    # explicit override wins regardless of platform
    assert _common.fused_dispatch(True, True) is True
    # explicit True + unsupported config raises (silent fallback would
    # build the compiler-crashing plain exact graph the user opted out of)
    with pytest.raises(ValueError, match="support envelope"):
        _common.fused_dispatch(True, False)
    assert _common.fused_dispatch(False, True) is False

    # auto: off off-TPU (conftest pins the cpu backend)
    assert jax.default_backend() != "tpu"
    assert _common.fused_dispatch(None, True) is False
    assert _common.fused_dispatch(None, True, for_exact=True) is False

    # mock a multi-device TPU realm: exact must raise, non-exact auto-off
    monkeypatch.setattr(
        _common.jax, "default_backend", lambda: "tpu"
    )
    monkeypatch.setattr(
        _common.jax, "devices", lambda: [object(), object()]
    )
    assert _common.fused_dispatch(None, True) is False
    with pytest.raises(ValueError, match="exact-trace flow solves"):
        _common.fused_dispatch(
            None, True, for_exact=True, what="exact-trace flow solves"
        )
    # unsupported config under exact trace: raise with estimator advice
    # (the plain graph is the crash family) — non-exact still falls through
    with pytest.raises(ValueError, match="hutchinson"):
        _common.fused_dispatch(None, False, for_exact=True)
    assert _common.fused_dispatch(None, False) is False

    # mock a single-device TPU realm: auto on; unsupported exact raises
    monkeypatch.setattr(_common.jax, "devices", lambda: [object()])
    assert _common.fused_dispatch(None, True) is True
    assert _common.fused_dispatch(None, True, for_exact=True) is True
    with pytest.raises(ValueError, match="hutchinson"):
        _common.fused_dispatch(None, False, for_exact=True)


def test_fused_envelope_is_per_solve_not_per_model(monkeypatch):
    """A wide (D + C in 17..64) model with the default trace_mode='exact'
    must keep its forward-only paths (sampling / EM drift) on the fused
    kernel: the exact-trace feature bound applies per SOLVE, not
    model-wide.  Regression: the envelope was once gated on the model's
    trace_mode, so wide exact models refused fused sampling (explicit
    use_fused_kernel=True raised) and sharded sampling fell through to
    the plain-XLA graph family that crashes this platform's compiler."""
    import dataclasses

    from flowfusion_tpu.models import _common
    from flowfusion_tpu.models.flow import ODEFlow

    D, C = 20, 4
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=C, units=(128,))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg, sde=VPSDE()
    )
    assert m.trace_mode == "exact"
    assert m._fused_supported(exact=False)       # forward envelope: wide ok
    assert not m._fused_supported(exact=True)    # exact keeps the 16 bound
    assert not m._fused_supported()              # model-wide = conservative

    # explicit use_fused_kernel=True: sampling dispatch fine, exact raises
    forced = dataclasses.replace(m, use_fused_kernel=True)
    assert forced._fused_available() is True
    with pytest.raises(ValueError, match="support envelope"):
        forced._fused_available(for_exact=True)

    # mocked single-device TPU realm: the per-shard variant forces the
    # kernel for sampling bodies (exact=False) but not for exact solves
    monkeypatch.setattr(_common.jax, "default_backend", lambda: "tpu")
    assert m._per_shard_variant(exact=False).use_fused_kernel is True
    assert m._per_shard_variant().use_fused_kernel is None

    # same contract on the flow side
    f = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=D, conditional_dimension=C,
        hidden_units=(128,),
    )
    assert f.trace_mode == "exact"
    assert f._fused_supported(exact=False)
    assert not f._fused_supported(exact=True)
    assert f._per_shard_variant(exact=False).use_fused_kernel is True
    assert f._per_shard_variant().use_fused_kernel is None


def test_log_prob_fixed_step_method_works():
    """log_prob with a fixed-step method must not inject the adaptive-only
    min_step option (regression: ValueError 'unknown fixed-step options')."""
    m = _analytic_model(VESDE(), s0=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2)) * 0.5
    lp_rk4, _ = jax.jit(
        lambda mm, xx: mm.log_prob(xx, method="rk4", options={"steps_per_interval": 200})
    )(m, x)
    lp_ad, _ = jax.jit(lambda mm, xx: mm.log_prob(xx, atol=1e-7, rtol=1e-7))(m, x)
    np.testing.assert_allclose(np.asarray(lp_rk4), np.asarray(lp_ad), atol=1e-3)


def test_explicit_fused_flag_with_unsupported_config_raises():
    # units=(100,) is inside the envelope since round-4 (pad_to_lanes);
    # a wide-feature exact-trace model is the remaining unsupported case
    cfg = ScoreMLPConfig(n_dimensions=20, units=(128,))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg,
        sde=VESDE(), use_fused_kernel=True, trace_mode="exact",
    )
    x = jnp.ones((4, 20))
    with pytest.raises(ValueError, match="support envelope"):
        m.log_prob(x, key=jax.random.PRNGKey(1))


def test_sample_dpm_uses_sde_horizon():
    """sample_dpm starts at t = sde.T (regression: hard-coded 1.0 treated
    prior-scale noise as mid-schedule states for any SDE with T != 1)."""
    sde = VESDE(T=2.0)
    s0 = 1.0
    m = _analytic_model(sde, s0=s0)
    base = jax.random.normal(jax.random.PRNGKey(0), (8192, 2))
    out = m.sample_dpm(base, steps=40)
    # analytic Gaussian transport by matched quantiles:
    # std(eps) = prior_scale * sqrt(var(eps) / var(T))
    def var_at(t):
        nu, eta = sde.marginal_prob_scalars(jnp.asarray(t))
        return float(nu) ** 2 * s0**2 + float(eta) ** 2

    expected = sde.prior_scale * np.sqrt(
        var_at(float(sde.epsilon)) / var_at(sde.T)
    )
    assert abs(float(out.std()) / expected - 1.0) < 0.1
