"""Training losses: denoising score matching and likelihood weighting.

Pure functions of (score_fn, sde, PRNG key, batch) — the reference versions
(/root/reference/flowfusion/diffusion.py:1369-1463) consume global torch RNG;
here keys are explicit so losses are reproducible and jit/vmap-safe.

Reduction contracts match the reference exactly: the two score-matching
losses sum squared residuals over batch *and* dimensions and divide by
batch size (diffusion.py:1404-1414); the flow-matching loss is a plain
mean over batch and dimensions (flow.py:223-256).
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
    # t is always float32 (the reference's torch.rand is f32 regardless of
    # the data dtype, and all SDE math is f32): drawing in x.dtype would
    # quantize the time distribution to a coarse lattice for bf16 data
    t = (
        jax.random.uniform(kt, (x.shape[0],), jnp.float32)
        * (sde.T - sde.epsilon)
        + sde.epsilon
    )
    return t, z


def _draw_xT_and_t(key: jax.Array, x0: jax.Array):
    """Flow-matching draw: base sample x_T ~ N(0,1) and t ~ U[0,1].

    Single source of the flow sampling convention — the fused training
    engine's table builder (kernels/fused_train.train_tables_flow) must
    consume the PRNG identically to :func:`flow_matching_loss`.
    """
    kz, kt = jax.random.split(key)
    xT = jax.random.normal(kz, x0.shape, x0.dtype)
    t = jax.random.uniform(kt, (x0.shape[0],), jnp.float32)
    return xT, t


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
    xT, t = _draw_xT_and_t(key, x0)
    # right-aligned broadcast over any per-sample rank (matches the
    # score-matching losses; a (B,1)-shaped t would misbroadcast 1-D or
    # rank-3 x0 silently)
    t_b = t.reshape((x0.shape[0],) + (1,) * (x0.ndim - 1))
    xt = (1.0 - t_b) * x0 + t_b * xT
    v_hat = xT - x0
    v_pred = velocity_fn(t, xt, conditional)
    return jnp.mean((v_pred - v_hat) ** 2)
