"""Population-wrapper tests: standardization semantics and quirk parity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flowfusion_tpu.models.population import PopulationModelDiffusion
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops.sde import VPSDE
import pytest


@dataclasses.dataclass(frozen=True)
class AnalyticGaussianScore:
    sde: object
    s0: float = 1.0

    def apply(self, params, t, x, conditional=None):
        nu, eta = self.sde.marginal_prob_scalars(jnp.asarray(t, jnp.float32))
        var = (nu * self.s0) ** 2 + eta**2
        return -x / var.reshape((-1,) + (1,) * (x.ndim - 1))


def _wrap(sde, shift, scale, s0=1.0):
    sm = ScoreModel(params={}, net=AnalyticGaussianScore(sde=sde, s0=s0), no_sigma=True, sde=sde)
    return PopulationModelDiffusion(
        score_model=sm,
        shift=jnp.asarray(shift, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        conditional_shift=None,
        conditional_scale=None,
    )


@pytest.mark.slow
def test_log_prob_is_standardized_units_by_default():
    """Reference quirk: the diffusion wrapper reports standardized-unit
    densities (no -sum(log scale) term) — SURVEY.md §2.6.5."""
    sde = VPSDE()
    shift, scale = np.array([2.0, -1.0]), np.array([3.0, 0.5])
    m = _wrap(sde, shift, scale)
    x_std = np.array([[0.3, -0.4]])
    x_raw = x_std * scale + shift
    m_unit = _wrap(sde, [0.0, 0.0], [1.0, 1.0])
    lp_wrapped, _ = m.log_prob(jnp.asarray(x_raw, jnp.float32))
    lp_unit, _ = m_unit.log_prob(jnp.asarray(x_std, jnp.float32))
    np.testing.assert_allclose(lp_wrapped, lp_unit, atol=1e-4)

    # volume_corrected adds the affine Jacobian.
    lp_corr, _ = m.log_prob(jnp.asarray(x_raw, jnp.float32), volume_corrected=True)
    np.testing.assert_allclose(
        lp_corr, lp_unit - np.sum(np.log(scale)), atol=1e-4
    )


def test_forward_applies_shift_scale():
    sde = VPSDE()
    shift, scale = np.array([5.0, 5.0]), np.array([2.0, 2.0])
    m = _wrap(sde, shift, scale)
    base = jax.random.normal(jax.random.PRNGKey(0), (512, 2))
    x, stats = m.forward(base)
    assert bool(np.all(stats.succeeded))
    # analytic-score model with s0=1: ODE-transported samples are ~N(0,1)
    # standardized, so raw-space mean/std follow shift/scale.
    np.testing.assert_allclose(np.mean(np.asarray(x), axis=0), shift, atol=0.3)
    np.testing.assert_allclose(np.std(np.asarray(x), axis=0), scale, atol=0.3)


def test_sample_sde_honours_steps():
    sde = VPSDE()
    m = _wrap(sde, [0.0, 0.0], [1.0, 1.0])
    x = m.sample_sde(jax.random.PRNGKey(0), (256, 2), steps=25)
    assert x.shape == (256, 2)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_create_conditional_wrapper_runs():
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0),
        VPSDE(),
        n_dimensions=2,
        n_conditionals=1,
        units=(32,),
        conditional_shift=[1.0],
        conditional_scale=[2.0],
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    c = jnp.ones((4, 1))
    lp, _ = m.log_prob(x, conditional=c)
    assert lp.shape == (4,)
    loss = m.loss_fn(jax.random.PRNGKey(2), x, conditional=c)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_wrapper_log_prob_adjoint_gradients():
    """Training through the wrapper-layer solve (the reference's
    odeint_adjoint switch, diffusion.py:620, 733, 1575-1585): gradients
    must flow from wrapper.log_prob into the net parameters."""
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0),
        VPSDE(),
        n_dimensions=2,
        units=(32,),
        shift=[1.0, -1.0],
        scale=[2.0, 0.5],
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    def loss(model):
        lp, _ = model.log_prob(x, atol=1e-3, rtol=1e-3, adjoint=True)
        return -jnp.mean(lp)

    g = jax.grad(loss)(m)
    leaves = jax.tree_util.tree_leaves(g.score_model.params)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


@pytest.mark.slow
def test_wrapper_forward_adjoint_gradients():
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0), VPSDE(), n_dimensions=2, units=(32,)
    )
    base = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    def loss(model):
        x0, _ = model.forward(base, adjoint=True)
        return jnp.sum(x0**2)

    g = jax.grad(loss)(m)
    leaves = jax.tree_util.tree_leaves(g.score_model.params)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_create_plumbs_kernel_knobs():
    """The wrapper forwards use_fused_kernel / kernel_compute_dtype to the
    underlying ScoreModel (serving-mode selection at the wrapper API)."""
    from flowfusion_tpu.ops.sde import VPSDE

    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0), VPSDE(), n_dimensions=2, units=(32,),
        trace_mode="hutchinson", use_fused_kernel=False,
        kernel_compute_dtype="highf32",
    )
    assert m.score_model.use_fused_kernel is False
    assert m.score_model.kernel_compute_dtype == "highf32"


@pytest.mark.slow
def test_wrapper_log_prob_per_sample_matches_batch_global():
    """The wrapper-level per-sample fast mode agrees with the batch-global
    wrapper log_prob at tight tolerances, honours volume correction, and
    returns per-row stats."""
    import dataclasses

    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0),
        VPSDE(),
        n_dimensions=2,
        units=(32,),
        scale=jnp.asarray([2.0, 0.5]),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 2))
    lp_b, _ = jax.jit(
        lambda mm, xx: mm.log_prob(xx, atol=1e-7, rtol=1e-7)
    )(m, x)
    lp_p, stats = jax.jit(
        lambda mm, xx: mm.log_prob_per_sample(xx, atol=1e-7, rtol=1e-7)
    )(m, x)
    assert stats.n_func_evals.shape == (24,)
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_b), atol=1e-4)

    lp_v, _ = jax.jit(
        lambda mm, xx: mm.log_prob_per_sample(
            xx, atol=1e-5, rtol=1e-5, volume_corrected=True
        )
    )(m, x)
    lp_u, _ = jax.jit(
        lambda mm, xx: mm.log_prob_per_sample(xx, atol=1e-5, rtol=1e-5)
    )(m, x)
    np.testing.assert_allclose(
        np.asarray(lp_u - lp_v),
        float(np.log(2.0) + np.log(0.5)),
        atol=1e-5,
    )


def test_conditional_without_stats_is_loud():
    """Passing a conditional to an unconditional wrapper raises a clear
    error (was 'ArrayImpl - NoneType'); supplying conditional stats with
    n_conditionals=0 raises at construction."""
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0), VPSDE(), n_dimensions=2, units=(16,)
    )
    x = jnp.ones((4, 2))
    with pytest.raises(ValueError, match="no conditional statistics"):
        m.log_prob(x, conditional=jnp.ones((4, 1)))
    with pytest.raises(ValueError, match="n_conditionals=0"):
        PopulationModelDiffusion.create(
            jax.random.PRNGKey(0), VPSDE(), n_dimensions=2, units=(16,),
            conditional_shift=jnp.ones((1,)),
        )
