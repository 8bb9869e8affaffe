"""ODEFlow tests: analytic linear flow oracle + API consistency."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.models.nets import VelocityMLPConfig


@dataclasses.dataclass(frozen=True)
class AnalyticLinearVelocity:
    """v(x, t) = a x: flow x(t) = x(0) e^{a t}; log|det J|(0->1) = a D."""

    a: float = -0.5
    dim: int = 2

    def apply(self, params, t, x, conditional=None):
        return self.a * x


def _analytic_flow(a=-0.5, dim=2, scale=None, shift=None):
    return ODEFlow(
        params={},
        target_shift=jnp.zeros((dim,)) if shift is None else jnp.asarray(shift),
        target_scale=jnp.ones((dim,)) if scale is None else jnp.asarray(scale),
        conditional_shift=None,
        conditional_scale=None,
        net=AnalyticLinearVelocity(a=a, dim=dim),
    )


def test_log_prob_linear_flow_closed_form():
    a, dim = -0.7, 2
    flow = _analytic_flow(a=a, dim=dim)
    x = jnp.asarray([[0.5, -0.3], [1.0, 0.2]], jnp.float32)
    lp, stats = flow.log_prob(x, atol=1e-7, rtol=1e-7)
    # x_T = x e^{a}; log p(x) = log N(xT) + a*D  (divergence integral = a D)
    xT = np.asarray(x) * np.exp(a)
    expected = np.sum(-0.5 * xT**2 - 0.5 * np.log(2 * np.pi), axis=1) + a * dim
    np.testing.assert_allclose(lp, expected, atol=1e-4)
    assert bool(np.all(stats.succeeded))


def test_log_prob_scale_correction():
    # With target_scale=s the density must include -sum(log s).
    a, dim, s = -0.4, 2, 2.5
    flow_unit = _analytic_flow(a=a, dim=dim)
    flow_scaled = _analytic_flow(a=a, dim=dim, scale=np.full(dim, s))
    x = jnp.asarray([[0.4, 0.8]], jnp.float32)
    lp_scaled, _ = flow_scaled.log_prob(x * s, atol=1e-7, rtol=1e-7)
    lp_unit, _ = flow_unit.log_prob(x, atol=1e-7, rtol=1e-7)
    np.testing.assert_allclose(
        lp_scaled, lp_unit - dim * np.log(s), rtol=1e-5, atol=1e-5
    )


def test_sample_inverts_log_prob_transform():
    a = -0.6
    flow = _analytic_flow(a=a)
    xT = jnp.asarray([[0.3, -0.2], [1.1, 0.7]], jnp.float32)
    x0, _ = flow.sample(xT)
    # Backward integration of dx/dt = a x from 1 to 0: x(0) = x(1) e^{-a}.
    np.testing.assert_allclose(x0, np.asarray(xT) * np.exp(-a), rtol=1e-5)


def test_linear_interpolant_path():
    flow = _analytic_flow()
    x0 = jnp.asarray([[1.0, 2.0]])
    xT = jnp.asarray([[-1.0, 0.0]])
    t = jnp.asarray([[0.25]])
    xt, v = flow.compute_linear_velocity_field(x0, xT, t)
    np.testing.assert_allclose(xt, 0.75 * np.asarray(x0) + 0.25 * np.asarray(xT))
    np.testing.assert_allclose(v, np.asarray(xT) - np.asarray(x0))


def test_flow_matching_loss_zero_at_optimum():
    """A velocity net that returns the conditional-expectation optimum of the
    one-sample objective can't be tested for exact zero, but the loss must be
    lower for the matched field than for a wrong one."""

    @dataclasses.dataclass(frozen=True)
    class ConstVelocity:
        c: float

        def apply(self, params, t, x, conditional=None):
            return jnp.full_like(x, self.c)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 2)) + 3.0
    # target velocity = xT - x0 has mean -3 under x0~N(3,1), xT~N(0,1)
    mk = lambda c: ODEFlow(
        params={},
        target_shift=jnp.zeros((2,)),
        target_scale=jnp.ones((2,)),
        conditional_shift=None,
        conditional_scale=None,
        net=ConstVelocity(c=c),
    )
    l_good = float(mk(-3.0).flow_matching_loss(key, x))
    l_bad = float(mk(3.0).flow_matching_loss(key, x))
    assert l_good < l_bad


@pytest.mark.slow
def test_create_and_real_net_runs():
    flow = ODEFlow.create(
        jax.random.PRNGKey(0),
        target_dimension=2,
        conditional_dimension=1,
        hidden_units=(32,),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    c = jnp.ones((4, 1))
    loss = flow.flow_matching_loss(jax.random.PRNGKey(2), x, c)
    assert np.isfinite(float(loss))
    lp, _ = flow.log_prob(x, c, atol=1e-4, rtol=1e-4)
    assert lp.shape == (4,)
    x0, _ = flow.sample(x, c, rtol=1e-5, atol=1e-5)
    assert x0.shape == (4, 2)


def test_hutchinson_mode_close_to_exact():
    flow_h = dataclasses.replace(_analytic_flow(a=-0.3), trace_mode="hutchinson")
    flow_e = _analytic_flow(a=-0.3)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 2)) * 0.5
    lp_h, _ = flow_h.log_prob(x, key=jax.random.PRNGKey(4))
    lp_e, _ = flow_e.log_prob(x)
    # linear isotropic field: Hutchinson is exact (J = aI, e^T J e = a e^T e = aD)
    np.testing.assert_allclose(lp_h, lp_e, atol=1e-4)


@pytest.mark.slow
def test_log_prob_per_sample_close_to_batch_global():
    flow = _analytic_flow(a=-0.7, scale=np.full(2, 1.5))
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, 2)) * 1.5, jnp.float32
    )
    lp_global, _ = flow.log_prob(x, atol=1e-6, rtol=1e-6)
    lp_per, stats = flow.log_prob_per_sample(x, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lp_per), np.asarray(lp_global), atol=2e-3
    )
    assert stats.n_accepted.shape == (8,)


@pytest.mark.slow
def test_log_prob_per_sample_real_net_conditional():
    flow = ODEFlow.create(
        jax.random.PRNGKey(0),
        target_dimension=2,
        conditional_dimension=1,
        hidden_units=(32,),
        trace_mode="hutchinson",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 2))
    c = jnp.linspace(-1, 1, 6)[:, None]
    # jit pins BOTH calls to the unrouted path so they draw the SAME
    # probes from the key (eager multi-device calls autoshard and fold
    # the key per shard — different probes by design)
    lp, stats = jax.jit(
        lambda mm, xx, cc, kk: mm.log_prob_per_sample(
            xx, conditional=cc, key=kk, atol=1e-4, rtol=1e-4
        )
    )(flow, x, c, jax.random.PRNGKey(2))
    assert lp.shape == (6,)
    assert np.all(np.isfinite(np.asarray(lp)))
    # same probes (jit keeps log_prob on the unrouted single-solve path),
    # different stepping: values should be near
    lp_g, _ = jax.jit(lambda mm, xx, cc, kk: mm.log_prob(xx, cc, key=kk))(
        flow, x, c, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_g), atol=5e-2)


@pytest.mark.slow
def test_flow_sketch_probe_knobs_are_honoured():
    """hpp_rank/hpp_vecs/xt_vecs on ODEFlow reach make_probes (they were
    previously locked to 1)."""
    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=3, hidden_units=(16,),
        trace_mode="xtrace", xt_vecs=3,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 3))
    lp, stats = jax.jit(
        lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-3, rtol=1e-3)
    )(flow, x, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(lp)))

    flow2 = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=3, hidden_units=(16,),
        trace_mode="hutchpp", hpp_rank=2, hpp_vecs=3,
    )
    lp2, _ = jax.jit(
        lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-3, rtol=1e-3)
    )(flow2, x, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(lp2)))
