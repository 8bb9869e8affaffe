"""Continuous-adjoint gradient tests."""

import numpy as np
import jax
import jax.numpy as jnp

from flowfusion_tpu.ops.integrate.adjoint import odeint_adjoint
import pytest


def test_adjoint_gradient_linear_closed_form():
    # dy/dt = -a y: y(1) = y0 e^-a; d/da = -y0 e^-a; d/dy0 = e^-a.
    def func(t, y, a):
        return -a * y

    def loss(y0, a):
        ys = odeint_adjoint(func, y0, [0.0, 1.0], a, rtol=1e-7, atol=1e-9)
        return jnp.sum(ys[-1])

    y0 = jnp.asarray([2.0, 3.0])
    a = jnp.asarray(0.7)
    g_y0, g_a = jax.grad(loss, argnums=(0, 1))(y0, a)
    np.testing.assert_allclose(g_y0, np.exp(-0.7), rtol=1e-4)
    np.testing.assert_allclose(g_a, -5.0 * np.exp(-0.7), rtol=1e-4)


def test_adjoint_gradient_time_dependent():
    # dy/dt = a cos(t): y(2) = y0 + a sin(2); d/da = sin(2).
    def func(t, y, a):
        return a * jnp.cos(t) * jnp.ones_like(y)

    def loss(a):
        ys = odeint_adjoint(func, jnp.zeros(1), [0.0, 2.0], a, rtol=1e-7, atol=1e-9)
        return ys[-1][0]

    g = jax.grad(loss)(jnp.asarray(1.3))
    np.testing.assert_allclose(g, np.sin(2.0), rtol=1e-4)


def test_adjoint_multiple_output_times():
    # L = sum_i y(t_i); gradient w.r.t. a accumulates all cotangents.
    def func(t, y, a):
        return -a * y

    ts = [0.0, 0.5, 1.0]

    def loss(a):
        ys = odeint_adjoint(func, jnp.ones(1), ts, a, rtol=1e-8, atol=1e-10)
        return jnp.sum(ys)

    g = jax.grad(loss)(jnp.asarray(0.5))
    expected = sum(-t * np.exp(-0.5 * t) for t in ts)
    np.testing.assert_allclose(g, expected, rtol=1e-4)


@pytest.mark.slow
def test_adjoint_pytree_params_mlp():
    """Adjoint grads through a tiny neural ODE match fixed-step autodiff."""
    from flowfusion_tpu.ops.integrate import odeint_fixed

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (2, 16)) * 0.5,
        "w2": jax.random.normal(k2, (16, 2)) * 0.5,
    }

    def func(t, y, p):
        return jnp.tanh(y @ p["w1"]) @ p["w2"]

    x0 = jnp.asarray([[0.3, -0.2], [0.1, 0.4]])

    def loss_adjoint(p):
        ys = odeint_adjoint(func, x0, [0.0, 1.0], p, rtol=1e-7, atol=1e-9)
        return jnp.sum(ys[-1] ** 2)

    def loss_fixed(p):
        ys = odeint_fixed(
            lambda t, y: func(t, y, p), x0, [0.0, 1.0], method="rk4",
            steps_per_interval=64,
        )
        return jnp.sum(ys[-1] ** 2)

    g_adj = jax.grad(loss_adjoint)(params)
    g_fix = jax.grad(loss_fixed)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_adj), jax.tree_util.tree_leaves(g_fix)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_adjoint_jits():
    def func(t, y, a):
        return -a * y

    @jax.jit
    def loss_and_grad(a):
        def loss(aa):
            ys = odeint_adjoint(func, jnp.ones(2), [0.0, 1.0], aa)
            return jnp.sum(ys[-1])

        return jax.value_and_grad(loss)(a)

    v, g = loss_and_grad(jnp.asarray(1.0))
    np.testing.assert_allclose(v, 2 * np.exp(-1), rtol=1e-5)
    np.testing.assert_allclose(g, -2 * np.exp(-1), rtol=1e-4)


def test_adjoint_decreasing_grid_gradient():
    """Production sampling integrates DECREASING grids (flow t:1->0,
    score t:1->eps); closed form: y(0) = y0*exp(a) for dy/dt = -a*y
    from t=1 to 0, so d/da mean(y(0)) = mean(y0)*exp(a)."""
    a0 = 0.7
    y0 = jnp.asarray([1.0, 2.0, -0.5])

    def loss(a):
        ys = odeint_adjoint(
            lambda t, y, p: -p * y, y0, [1.0, 0.0], a,
            rtol=1e-8, atol=1e-10,
        )
        return jnp.mean(ys[-1])

    g = jax.grad(loss)(jnp.asarray(a0))
    expected = float(np.mean(np.asarray(y0)) * np.exp(a0))
    np.testing.assert_allclose(float(g), expected, rtol=1e-4)
    np.testing.assert_allclose(float(loss(jnp.asarray(a0))), expected, rtol=1e-4)


def test_adjoint_gradient_flows_into_closed_over_values():
    """Values func closes over (the models close over the conditioning
    batch) are closure-converted: grads flow instead of raising
    CustomVJPException."""
    y0 = jnp.asarray([[1.0, -1.0]])

    def loss(cond):
        # cond enters ONLY through the closure, like the model call sites
        def f(t, y, p):
            return -p * y + cond
        ys = odeint_adjoint(f, y0, [0.0, 1.0], jnp.asarray(0.5),
                            rtol=1e-7, atol=1e-9)
        return jnp.sum(ys[-1])

    cond = jnp.asarray([[0.3, 0.1]])
    g = jax.grad(loss)(cond)
    # d y(1) / d cond = (1 - exp(-a)) / a elementwise
    a = 0.5
    expected = (1.0 - np.exp(-a)) / a
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4)


def test_adjoint_rejects_fixed_step_methods():
    with np.testing.assert_raises(ValueError):
        odeint_adjoint(
            lambda t, y, p: -y, jnp.ones(2), [0.0, 1.0], None, method="rk4"
        )


def test_adjoint_failure_poisons_output_not_silent():
    """Exhausting max_num_steps must surface as NaN (stats cannot cross
    the custom-vjp boundary), never as silently-finite wrong values."""
    y0 = jnp.ones((3,))

    ys = odeint_adjoint(
        lambda t, y, p: jnp.full_like(y, jnp.nan), y0, [0.0, 1.0], None,
        options={"max_num_steps": 8},
    )
    assert bool(jnp.all(jnp.isnan(ys[-1])))


def _adjoint_test_model():
    import dataclasses  # noqa: F401  (re-exported for the grad test)

    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    cfg = ScoreMLPConfig(n_dimensions=2, units=(16,))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg,
        sde=VPSDE(), trace_mode="xtrace",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    return m, x


def test_model_adjoint_rejects_xtrace():
    """xtrace has no gradient (fully detached sketch) and must be
    rejected loudly under adjoint."""
    m, x = _adjoint_test_model()
    with np.testing.assert_raises(NotImplementedError):
        m.solve_odes_forward(x, key=jax.random.PRNGKey(2), adjoint=True)


@pytest.mark.slow
def test_model_adjoint_supports_hutchpp():
    """hutchpp's measurement terms DO carry gradients — its adjoint
    log_prob gradient must be close to the exact-trace adjoint gradient
    (regression: it used to be divergence-blind, silently dropping the
    whole volume term)."""
    import dataclasses

    m, x = _adjoint_test_model()

    def grad_for(mode, hpp_rank=2, hpp_vecs=2):
        mm = dataclasses.replace(m, trace_mode=mode, hpp_rank=hpp_rank,
                                 hpp_vecs=hpp_vecs)

        def loss(model):
            lp, _ = model.log_prob(
                x, key=jax.random.PRNGKey(3), atol=1e-6, rtol=1e-6,
                adjoint=True,
            )
            return jnp.mean(lp)

        return jax.grad(loss)(mm).params

    g_exact = grad_for("exact")
    g_hpp = grad_for("hutchpp")  # rank 2 = D: sketch captures full range
    for a, b in zip(
        jax.tree_util.tree_leaves(g_exact), jax.tree_util.tree_leaves(g_hpp)
    ):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-2
        )


@pytest.mark.slow
def test_adjoint_matches_backprop_on_flagship():
    """Regression gate (VERDICT r3 item 5): on the committed flagship
    field, the O(1)-memory continuous-adjoint gradient of mean log_prob
    matches the gradient obtained by differentiating straight through an
    NFE-matched fixed-step rk4 solve.  Guards the adjoint's
    closure_convert plumbing end-to-end on a REAL trained model (the unit
    tests above use synthetic fields)."""
    import dataclasses
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "benchmarks", "flagship_ckpt.npz")
    if not os.path.exists(ckpt):
        pytest.skip("committed flagship checkpoint absent")
    sys.path.insert(0, repo)
    from bench import build_trained_model

    model, x, _ = build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    model = dataclasses.replace(
        model, trace_mode="hutchinson", use_fused_kernel=False
    )
    xb = x[:64]
    kk = jax.random.PRNGKey(3)

    def loss_adjoint(p):
        m = dataclasses.replace(model, params=p)
        lp, _ = m.log_prob(xb, key=kk, atol=1e-6, rtol=1e-6, adjoint=True)
        return -jnp.mean(lp)

    def loss_backprop(p):
        m = dataclasses.replace(model, params=p)
        # rk4 with enough steps to sit below the adjoint's tolerance
        lp, _ = m.log_prob(xb, key=kk, method="rk4", options={"steps": 256})
        return -jnp.mean(lp)

    va, ga = jax.value_and_grad(loss_adjoint)(model.params)
    vb, gb = jax.value_and_grad(loss_backprop)(model.params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-4, atol=1e-4)
    flat_a = jnp.concatenate(
        [jnp.ravel(l) for l in jax.tree_util.tree_leaves(ga)]
    )
    flat_b = jnp.concatenate(
        [jnp.ravel(l) for l in jax.tree_util.tree_leaves(gb)]
    )
    # cosine similarity + relative norm: the two discretizations agree to
    # solver truncation, far tighter than any training-relevant signal
    cos = float(
        jnp.vdot(flat_a, flat_b)
        / (jnp.linalg.norm(flat_a) * jnp.linalg.norm(flat_b))
    )
    assert cos > 0.999, cos
    rel = float(
        jnp.linalg.norm(flat_a - flat_b) / jnp.linalg.norm(flat_b)
    )
    assert rel < 0.02, rel
