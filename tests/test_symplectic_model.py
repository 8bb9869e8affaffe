"""Symplectic model tests: divergence-free property and exact log-prob."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from flowfusion_tpu.models.nets import SymplecticMLPConfig, init_symplectic_mlp
from flowfusion_tpu.models.symplectic import SymplecticFlowModel
from flowfusion_tpu.ops.trace import exact_divergence
import pytest


def _model(key=None, d=2, cond=0):
    return SymplecticFlowModel.create(
        key if key is not None else jax.random.PRNGKey(0),
        n_data_dims=d,
        n_conditionals=cond,
        units=(32,),
    )


def test_dynamics_exactly_divergence_free():
    """The separable-Hamiltonian construction guarantees div v == 0."""
    m = _model()
    t = jnp.asarray(0.37)

    f = lambda s: m.dynamics(t, s)
    state = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    _, div = exact_divergence(f, state)
    np.testing.assert_allclose(div, 0.0, atol=1e-5)


def test_log_prob_identity_dynamics():
    """With zero dynamics the flow is the identity: log p(q0) estimate is
    log N(q0) exactly (momentum terms cancel)."""

    @dataclasses.dataclass(frozen=True)
    class ZeroNet:
        def apply(self, params, t, state, conditional=None):
            return jnp.zeros_like(state)

    m = SymplecticFlowModel(
        params={},
        shift=jnp.zeros((2,)),
        scale=jnp.ones((2,)),
        conditional_shift=None,
        conditional_scale=None,
        net=ZeroNet(),
    )
    x = jnp.asarray([[0.3, -1.2], [0.0, 0.5]], jnp.float32)
    lp, stats = m.log_prob(jax.random.PRNGKey(0), x)
    expected = np.sum(-0.5 * np.asarray(x) ** 2 - 0.5 * np.log(2 * np.pi), axis=1)
    np.testing.assert_allclose(lp, expected, atol=1e-5)
    # eager multi-device calls route per shard: one succeeded flag each
    assert bool(jnp.all(stats.succeeded))


def test_log_prob_scale_correction():
    @dataclasses.dataclass(frozen=True)
    class ZeroNet:
        def apply(self, params, t, state, conditional=None):
            return jnp.zeros_like(state)

    s = 3.0
    m = SymplecticFlowModel(
        params={},
        shift=jnp.zeros((2,)),
        scale=jnp.full((2,), s),
        conditional_shift=None,
        conditional_scale=None,
        net=ZeroNet(),
    )
    x = jnp.asarray([[0.6, -0.9]], jnp.float32)
    lp, _ = m.log_prob(jax.random.PRNGKey(0), x)
    q = np.asarray(x) / s
    expected = np.sum(-0.5 * q**2 - 0.5 * np.log(2 * np.pi), axis=1) - 2 * np.log(s)
    np.testing.assert_allclose(lp, expected, atol=1e-5)


def test_sample_shapes_and_one_step_default():
    m = _model()
    x = m.sample(jax.random.PRNGKey(0), (16, 2))
    assert x.shape == (16, 2)
    x2 = m.sample(jax.random.PRNGKey(0), (16, 2), num_steps=8)
    assert x2.shape == (16, 2)


def test_conditional_plumbing():
    m = _model(cond=2)
    c1 = jnp.zeros((4, 2))
    c2 = jnp.ones((4, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    lp1, _ = m.log_prob(jax.random.PRNGKey(2), x, conditional=c1)
    lp2, _ = m.log_prob(jax.random.PRNGKey(2), x, conditional=c2)
    assert not np.allclose(lp1, lp2)


def test_loss_finite_and_differentiable():
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))

    def loss(params):
        mm = dataclasses.replace(m, params=params)
        return mm.loss_fn(jax.random.PRNGKey(2), x)

    val, grads = jax.value_and_grad(loss)(m.params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_leapfrog_sampler_runs_and_matches_euler_at_fine_steps():
    m = _model()
    x_lf = m.sample(jax.random.PRNGKey(0), (256, 2), num_steps=64, method="leapfrog")
    x_eu = m.sample(jax.random.PRNGKey(0), (256, 2), num_steps=256, method="euler")
    # both converge to the same flow at fine steps (same joint noise draw)
    np.testing.assert_allclose(np.asarray(x_lf), np.asarray(x_eu), atol=0.05)


def test_leapfrog_time_reversible():
    from flowfusion_tpu.ops.integrate.fixed import leapfrog

    m = _model()
    cond = None
    q0 = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    p0 = jax.random.normal(jax.random.PRNGKey(2), (16, 2))

    def vq(t, p):
        joint = jnp.concatenate([jnp.zeros_like(p), p], axis=-1)
        return jnp.split(m.dynamics(t, joint, cond), 2, axis=-1)[0]

    def vp(t, q):
        joint = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
        return jnp.split(m.dynamics(t, joint, cond), 2, axis=-1)[1]

    q1, p1 = leapfrog(vq, vp, q0, p0, t0=0.0, t1=1.0, steps=32)
    q0b, p0b = leapfrog(vq, vp, q1, p1, t0=1.0, t1=0.0, steps=32)
    np.testing.assert_allclose(np.asarray(q0b), np.asarray(q0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p0b), np.asarray(p0), atol=1e-4)


@pytest.mark.slow
def test_log_prob_adjoint_gradients():
    """adjoint=True gives finite parameter gradients through the solve
    (the default no-grad paths — plain while_loop or fused kernel — are
    forward-only)."""
    import dataclasses

    model = SymplecticFlowModel.create(jax.random.PRNGKey(0), n_data_dims=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    key = jax.random.PRNGKey(2)

    def loss(params):
        m = dataclasses.replace(model, params=params)
        lp, _ = m.log_prob(key, x, adjoint=True)
        return -lp.mean()

    grads = jax.grad(loss)(model.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # at least one grad leaf is materially nonzero
    assert max(float(jnp.abs(l).max()) for l in leaves) > 0.0

    # adjoint value agrees with the forward-only solve (jit pins the
    # forward call to the unrouted path, so both draw the SAME momentum
    # p0 from `key` — the routed path folds the key per shard)
    lp_adj, _ = model.log_prob(key, x, adjoint=True)
    lp_fwd, _ = jax.jit(lambda mm, kk, xx: mm.log_prob(kk, xx))(model, key, x)
    np.testing.assert_allclose(
        np.asarray(lp_adj), np.asarray(lp_fwd), atol=1e-4
    )


@pytest.mark.slow
def test_log_prob_multi_momentum_tightens_bound():
    """The K-momentum-sample IWAE-style estimate is a tighter (larger)
    log-likelihood bound than the reference's single draw, and for
    identity-like dynamics where the bound is exact it agrees with K=1."""
    model = SymplecticFlowModel.create(jax.random.PRNGKey(0), n_data_dims=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2))

    # average over several keys: Jensen guarantees E[IWAE_K] >= E[IWAE_1]
    lp1, lpK = [], []
    for s in range(4):
        k = jax.random.PRNGKey(10 + s)
        lp1.append(float(model.log_prob(k, x)[0].mean()))
        lpK.append(float(model.log_prob(k, x, n_momentum_samples=8)[0].mean()))
    assert np.mean(lpK) >= np.mean(lp1) - 1e-3

    with np.testing.assert_raises(ValueError):
        model.log_prob(jax.random.PRNGKey(0), x, n_momentum_samples=0)


def test_log_prob_per_sample_matches_batch_global():
    """Per-sample stepping agrees with the batch-global solve at tight
    tolerances when both draw the SAME momentum (jit pins both calls to
    the unrouted path so `key` produces identical p0)."""
    model = _model(d=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 2))
    key = jax.random.PRNGKey(7)
    lp_batch, _ = jax.jit(lambda m, k, xx: m.log_prob(k, xx, atol=1e-7, rtol=1e-7))(
        model, key, x
    )
    lp_per, stats = jax.jit(
        lambda m, k, xx: m.log_prob_per_sample(k, xx, atol=1e-7, rtol=1e-7)
    )(model, key, x)
    np.testing.assert_allclose(np.asarray(lp_per), np.asarray(lp_batch), atol=1e-4)
    # per-sample stats: one step sequence per row
    assert stats.n_func_evals.shape == (32,)
    assert bool(jnp.all(stats.succeeded))


@pytest.mark.slow
def test_log_prob_per_sample_conditional():
    model = _model(cond=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 2))
    c = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    key = jax.random.PRNGKey(8)
    lp_batch, _ = jax.jit(
        lambda m, k, xx, cc: m.log_prob(k, xx, conditional=cc, atol=1e-7, rtol=1e-7)
    )(model, key, x, c)
    lp_per, _ = jax.jit(
        lambda m, k, xx, cc: m.log_prob_per_sample(
            k, xx, conditional=cc, atol=1e-7, rtol=1e-7
        )
    )(model, key, x, c)
    np.testing.assert_allclose(np.asarray(lp_per), np.asarray(lp_batch), atol=1e-4)
