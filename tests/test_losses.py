"""Loss-function unit tests against hand-rolled computations."""

import numpy as np
import jax
import jax.numpy as jnp

from flowfusion_tpu.ops.losses import (
    denoising_score_matching,
    flow_matching_loss,
    log_prob_score_matching,
)
from flowfusion_tpu.ops.sde import VPSDE


def test_dsm_reduction_contract():
    """sum over batch AND dims, divided by batch (diffusion.py:1404-1414)."""
    sde = VPSDE()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 3))

    def zero_score(t, xx, cond):
        return jnp.zeros_like(xx)

    loss = denoising_score_matching(zero_score, sde, key, x)
    # with s == 0 the residual is exactly z: E||z||^2 summed / batch = ~dims
    kz, kt = jax.random.split(key)
    z = jax.random.normal(kz, x.shape, x.dtype)
    np.testing.assert_allclose(float(loss), float(jnp.sum(z**2) / 32), rtol=1e-6)


def test_dsm_uses_marginal_inputs():
    """The score fn must be evaluated at mean + sigma z: a score that
    inverts the known closed form drives the loss to zero."""
    sde = VPSDE()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    kz, kt = jax.random.split(key)
    z = jax.random.normal(kz, x.shape, x.dtype)
    t = jax.random.uniform(kt, (64,)) * (sde.T - sde.epsilon) + sde.epsilon
    nu, eta = sde.marginal_prob_scalars(t)

    def perfect_score(tt, xt, cond):
        # s = -z / eta  makes  z + eta s == 0 for this draw
        return -z / eta[:, None]

    loss = denoising_score_matching(perfect_score, sde, key, x)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-9)


def test_likelihood_weighting_relationship():
    """LW loss = DSM residual scaled by g/eta per sample (Song+2021b)."""
    sde = VPSDE()
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 2))

    def some_score(t, xt, cond):
        return -0.3 * xt

    l_dsm = denoising_score_matching(some_score, sde, key, x)
    l_lw = log_prob_score_matching(some_score, sde, key, x)
    assert np.isfinite(float(l_dsm)) and np.isfinite(float(l_lw))
    assert float(l_lw) > 0.0


def test_flow_matching_loss_formula():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (128, 2))

    def v(t, xt, cond):
        return jnp.zeros_like(xt)

    loss = flow_matching_loss(v, key, x0)
    kz, kt = jax.random.split(key)
    xT = jax.random.normal(kz, x0.shape, x0.dtype)
    np.testing.assert_allclose(float(loss), float(jnp.mean((xT - x0) ** 2)), rtol=1e-6)


def test_flow_matching_loss_any_rank():
    """t broadcasts right-aligned: 1-D and rank-3 x0 give per-sample
    interpolants (regression: (B,1) t misbroadcast (B,) x0 to (B,B))."""
    from flowfusion_tpu.ops.losses import flow_matching_loss

    captured = {}

    def v_fn(t, xt, cond):
        captured["xt"] = xt
        return jnp.zeros_like(xt)

    x1 = jnp.ones((8,))
    flow_matching_loss(v_fn, jax.random.PRNGKey(0), x1)
    assert captured["xt"].shape == (8,)

    x3 = jnp.ones((8, 3, 2))
    flow_matching_loss(v_fn, jax.random.PRNGKey(0), x3)
    assert captured["xt"].shape == (8, 3, 2)


def test_loss_time_draw_is_float32_for_bf16_data():
    """t stays f32 for low-precision data (reference: torch.rand is f32)."""
    from flowfusion_tpu.ops.losses import denoising_score_matching
    from flowfusion_tpu.ops.sde import VPSDE

    seen = {}

    def score_fn(t, x, cond):
        seen["t_dtype"] = t.dtype
        return jnp.zeros_like(x)

    x = jnp.ones((16, 2), jnp.bfloat16)
    denoising_score_matching(score_fn, VPSDE(), jax.random.PRNGKey(0), x)
    assert seen["t_dtype"] == jnp.float32
