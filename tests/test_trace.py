"""Trace-estimator tests on functions with known divergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.ops.trace import (
    exact_divergence,
    hutchinson_divergence,
    hutchpp_divergence,
    rademacher,
    xtrace_divergence,
)

D = 6
B = 4


def _linear_f(A):
    return lambda x: x @ A.T


def _make_A(key):
    return jax.random.normal(key, (D, D)) / np.sqrt(D)


def test_exact_divergence_linear():
    A = _make_A(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    x_dot, div = exact_divergence(_linear_f(A), x)
    np.testing.assert_allclose(x_dot, x @ A.T, rtol=1e-5)
    np.testing.assert_allclose(div, jnp.full((B,), jnp.trace(A)), rtol=1e-5)


def test_exact_divergence_nonlinear():
    # f(x) = sin(x) elementwise -> div = sum cos(x_i)
    f = jnp.sin
    x = jax.random.normal(jax.random.PRNGKey(2), (B, D))
    _, div = exact_divergence(f, x)
    np.testing.assert_allclose(div, jnp.sum(jnp.cos(x), axis=1), rtol=1e-5)


def test_hutchinson_unbiased_linear():
    A = _make_A(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, D))
    # average over many probes -> trace (vmapped for speed)
    keys = jax.random.split(jax.random.PRNGKey(10), 4000)
    f = _linear_f(A)

    def one(k):
        e = rademacher(k, (1, D))
        return hutchinson_divergence(f, x, e)[1][0]

    ests = jax.vmap(one)(keys)
    np.testing.assert_allclose(np.mean(np.asarray(ests)), float(jnp.trace(A)), atol=0.05)


def test_hutchinson_matches_eJe_identity():
    # For a fixed probe the estimate must equal e^T J e exactly.
    A = _make_A(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (B, D))
    e = rademacher(jax.random.PRNGKey(5), (B, D))
    _, div = hutchinson_divergence(_linear_f(A), x, e)
    expected = jnp.einsum("bi,ij,bj->b", e, A, e)
    np.testing.assert_allclose(div, expected, rtol=1e-5)


def test_hutchpp_exact_when_full_rank():
    # With r >= D the QR sketch spans the full space: estimate is exact.
    A = _make_A(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (B, D))
    S = rademacher(jax.random.PRNGKey(8), (D, B, D))
    G = rademacher(jax.random.PRNGKey(9), (2, B, D))
    _, div = hutchpp_divergence(_linear_f(A), x, S, G)
    np.testing.assert_allclose(div, jnp.full((B,), jnp.trace(A)), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_hutchpp_unbiased_low_rank():
    A = _make_A(jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(11), (1, D))
    f = _linear_f(A)

    def one(k):
        k1, k2 = jax.random.split(k)
        S = rademacher(k1, (2, 1, D))
        G = rademacher(k2, (3, 1, D))
        return hutchpp_divergence(f, x, S, G)[1][0]

    ests = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(100), 1000))
    np.testing.assert_allclose(np.mean(np.asarray(ests)), float(jnp.trace(A)), atol=0.08)


def test_xtrace_matches_float64_oracle():
    from oracles import numpy_xtrace

    A = _make_A(jax.random.PRNGKey(12))
    x = jax.random.normal(jax.random.PRNGKey(13), (B, D))
    O = rademacher(jax.random.PRNGKey(14), (4, B, D))
    _, div = xtrace_divergence(_linear_f(A), x, O)
    expected = numpy_xtrace(np.asarray(A), np.asarray(O))
    np.testing.assert_allclose(div, expected, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_xtrace_unbiased():
    A = _make_A(jax.random.PRNGKey(15))
    x = jax.random.normal(jax.random.PRNGKey(16), (1, D))
    f = _linear_f(A)

    def one(k):
        O = rademacher(k, (3, 1, D))
        return xtrace_divergence(f, x, O)[1][0]

    ests = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(700), 1000))
    np.testing.assert_allclose(np.mean(np.asarray(ests)), float(jnp.trace(A)), atol=0.1)


@pytest.mark.parametrize("estimator", ["exact", "hutchinson", "hutchpp", "xtrace"])
def test_estimators_jit_and_return_xdot(estimator):
    A = _make_A(jax.random.PRNGKey(17))
    x = jax.random.normal(jax.random.PRNGKey(18), (B, D))
    f = _linear_f(A)
    if estimator == "exact":
        fn = jax.jit(lambda xx: exact_divergence(f, xx))
        x_dot, div = fn(x)
    elif estimator == "hutchinson":
        e = rademacher(jax.random.PRNGKey(19), (B, D))
        x_dot, div = jax.jit(lambda xx: hutchinson_divergence(f, xx, e))(x)
    elif estimator == "hutchpp":
        S = rademacher(jax.random.PRNGKey(20), (2, B, D))
        G = rademacher(jax.random.PRNGKey(21), (2, B, D))
        x_dot, div = jax.jit(lambda xx: hutchpp_divergence(f, xx, S, G))(x)
    else:
        O = rademacher(jax.random.PRNGKey(22), (3, B, D))
        x_dot, div = jax.jit(lambda xx: xtrace_divergence(f, xx, O))(x)
    np.testing.assert_allclose(x_dot, f(x), rtol=1e-5)
    assert div.shape == (B,)


def test_xtrace_probes_never_degenerate_low_dim():
    """Regression: D=2, m=2 Rademacher probes are (anti)parallel for half
    the batch -> singular sketches -> NaN.  Sphere probes (make_probes)
    must keep every estimate finite."""
    from flowfusion_tpu.ops.trace import make_probes

    A = _make_A(jax.random.PRNGKey(30))[:2, :2]
    x = jax.random.normal(jax.random.PRNGKey(31), (256, 2))
    f = lambda xx: xx @ A.T
    (O,) = make_probes("xtrace", jax.random.PRNGKey(32), x, xt_vecs=2)
    _, div = xtrace_divergence(f, x, O)
    assert np.all(np.isfinite(np.asarray(div)))
    # still unbiased-ish in aggregate
    np.testing.assert_allclose(
        float(jnp.mean(div)), float(jnp.trace(A)), atol=0.2
    )


@pytest.mark.slow
def test_hutchpp_divergence_gradient_matches_exact():
    """Hutch++ measurements carry gradients (only the sketch construction
    is detached): with full-rank probes the estimate is exact, so its
    parameter gradient must match the exact-divergence gradient."""
    D = 3

    def f_of(a):
        return lambda x: jnp.tanh(x * a) + 0.3 * a * x**2

    x = jax.random.normal(jax.random.PRNGKey(0), (8, D))
    kS, kG = jax.random.split(jax.random.PRNGKey(1))
    # r = D sketch probes => Q spans the full range => exact estimate
    S = jnp.sign(jax.random.normal(kS, (D, 8, D)))
    G = jnp.sign(jax.random.normal(kG, (2, 8, D)))

    def div_hpp(a):
        _, div = hutchpp_divergence(f_of(a), x, S, G)
        return jnp.sum(div)

    def div_exact(a):
        _, div = exact_divergence(f_of(a), x)
        return jnp.sum(div)

    a0 = jnp.asarray(0.7)
    np.testing.assert_allclose(float(div_hpp(a0)), float(div_exact(a0)), rtol=1e-5)
    g_hpp = float(jax.grad(div_hpp)(a0))
    g_exact = float(jax.grad(div_exact)(a0))
    assert g_exact != 0.0
    np.testing.assert_allclose(g_hpp, g_exact, rtol=1e-4)


def test_xtrace_divergence_has_no_gradient_by_design():
    """XTrace is value-only (fully detached); its gradient is exactly 0 —
    the models reject it under adjoint for this reason."""
    D = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (8, D))
    O = jax.random.normal(jax.random.PRNGKey(1), (2, 8, D))
    O = O / jnp.linalg.norm(O, axis=-1, keepdims=True) * jnp.sqrt(float(D))

    def div_of(a):
        _, div = xtrace_divergence(lambda xx: jnp.tanh(a * xx), x, O)
        return jnp.sum(div)

    assert float(jax.grad(div_of)(jnp.asarray(0.5))) == 0.0


def test_qr_cols_rejects_more_columns_than_dims():
    from flowfusion_tpu.ops.trace import _qr_cols

    cols = [jnp.ones((2, 4)) for _ in range(3)]  # m=3 > D=2
    with pytest.raises(ValueError, match="orthonormal"):
        _qr_cols(cols)


def test_mode_validation_messages():
    from flowfusion_tpu.ops.trace import divergence_fn, make_probes

    x = jnp.ones((4, 2))
    with pytest.raises(ValueError, match="unknown trace mode"):
        make_probes("hutch", None, x)  # typo: mode checked BEFORE key
    with pytest.raises(ValueError, match="unknown trace mode"):
        divergence_fn("hutch")
    with pytest.raises(ValueError, match=r"\(B, D\)"):
        make_probes("hutchpp", jax.random.PRNGKey(0), jnp.ones((4, 2, 2)))
