"""Training losses: denoising score matching and likelihood weighting.

Pure functions of (score_fn, sde, PRNG key, batch) — the reference versions
(/root/reference/flowfusion/diffusion.py:1369-1463) consume global torch RNG;
here keys are explicit so losses are reproducible and jit/vmap-safe.

Reduction contract matches the reference exactly: sum of squared residuals
over batch *and* dimensions, divided by batch size.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .sde import SDE

__all__ = ["denoising_score_matching", "log_prob_score_matching", "flow_matching_loss"]

ScoreFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def _draw_t_and_z(key: jax.Array, sde: SDE, x: jax.Array):
    kz, kt = jax.random.split(key)
    z = jax.random.normal(kz, x.shape, x.dtype)
    t = (
        jax.random.uniform(kt, (x.shape[0],), x.dtype)
        * (sde.T - sde.epsilon)
        + sde.epsilon
    )
    return t, z


def denoising_score_matching(
    score_fn: ScoreFn,
    sde: SDE,
    key: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """DSM loss (Song+2021): E ||z + eta_t s(t, mu_t + eta_t z, c)||^2.

    Reference: diffusion.py:1369-1414 (sum over batch+dims, / batch).
    """
    batch = x.shape[0]
    t, z = _draw_t_and_z(key, sde, x)
    mean, sigma = sde.marginal_prob(t, x)
    s = score_fn(t, mean + sigma * z, conditional)
    return jnp.sum((z + sigma * s) ** 2) / batch


def log_prob_score_matching(
    score_fn: ScoreFn,
    sde: SDE,
    key: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """Likelihood-weighted score matching (Song+2021b, arXiv:2101.09258).

    Reference: diffusion.py:1417-1463.
    """
    batch = x.shape[0]
    t, z = _draw_t_and_z(key, sde, x)
    g = sde.diffusion(t, x)
    mean, sigma = sde.marginal_prob(t, x)
    s = score_fn(t, mean + sigma * z, conditional)
    return jnp.sum(((g / sigma) * z + g * s) ** 2) / batch


def flow_matching_loss(
    velocity_fn: Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array],
    key: jax.Array,
    x0: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """Conditional flow-matching / rectified-flow loss with linear interpolant.

    x_t = (1-t) x0 + t x_T with x_T ~ N(0,1), target velocity x_T - x0
    (Lipman+2023).  ``x0`` must already be standardized — the model wrappers
    own shift/scale (reference flow.py:191-256).  Mean over batch and dims.
    """
    kz, kt = jax.random.split(key)
    xT = jax.random.normal(kz, x0.shape, x0.dtype)
    t = jax.random.uniform(kt, (x0.shape[0], 1), x0.dtype)
    xt = (1.0 - t) * x0 + t * xT
    v_hat = xT - x0
    v_pred = velocity_fn(t[:, 0], xt, conditional)
    return jnp.mean((v_pred - v_hat) ** 2)
