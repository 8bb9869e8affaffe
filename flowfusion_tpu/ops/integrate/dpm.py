r"""DPM-Solver: exponential-integrator sampling for diffusion models.

A capability beyond the reference (whose only deterministic sampler is
dopri5 over the probability-flow ODE, ~50-250 network evaluations): the
SDEs here are semi-linear, so the probability-flow ODE has the exact
variation-of-constants form (Lu et al. 2022, arXiv:2206.00927)

    x_t = (nu_t / nu_s) x_s - nu_t \int_{lam_s}^{lam_t} e^{-lam} eps(x, lam) dlam

with lam the half-log-SNR and eps the noise prediction
(eps = -eta(t) * score).  Discretizing on a uniform-lambda grid gives
samplers whose only error is in the eps integrand — 10-20 evaluations
reach dopri5-at-1e-4 quality on smooth models.  Orders 1 (DDIM) and 2
(midpoint) are provided; both are a single ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["dpm_solver_sample"]


def dpm_solver_sample(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    sde,
    x_T: jax.Array,
    steps: int = 12,
    order: int = 2,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
) -> jax.Array:
    """Integrate the probability-flow ODE from t_start (noise) to t_end.

    ``eps_fn(t_batch, x)`` is the noise prediction at time t (shape (B,)
    times).  ``x_T`` are prior samples *including* the prior scale (i.e.
    x(T) ~ N(0, prior_scale^2) for VESDE).  Returns x(t_end).
    """
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    t0 = float(t_start if t_start is not None else sde.T)
    t1 = float(t_end if t_end is not None else sde.epsilon)

    lam0 = sde.log_snr(jnp.asarray(t0, jnp.float32))
    lam1 = sde.log_snr(jnp.asarray(t1, jnp.float32))
    lams = jnp.linspace(lam0, lam1, steps + 1)
    # pin the endpoints: the inverse log-SNR round-trip carries f32 error
    # (e.g. sub-VP defaults give t_of_log_snr(log_snr(1.0)) = 1.0000784),
    # and the first/last network evaluations must stay inside the trained
    # [epsilon, T] range regardless of the inverse's accuracy
    ts = sde.t_of_log_snr(lams).at[0].set(t0).at[-1].set(t1)

    def alpha(t):
        return sde.marginal_prob_scalars(t)[0]

    def sigma(t):
        return sde.marginal_prob_scalars(t)[1]

    def batch_t(t, x):
        return jnp.full((x.shape[0],), t, x.dtype)

    def step(x, i):
        t_s, t_t = ts[i], ts[i + 1]
        lam_s, lam_t = lams[i], lams[i + 1]
        h = lam_t - lam_s
        eps_s = eps_fn(batch_t(t_s, x), x)
        if order == 1:
            x_new = (alpha(t_t) / alpha(t_s)) * x - sigma(t_t) * jnp.expm1(h) * eps_s
        else:
            lam_m = 0.5 * (lam_s + lam_t)
            t_m = sde.t_of_log_snr(lam_m)
            u = (alpha(t_m) / alpha(t_s)) * x - sigma(t_m) * jnp.expm1(0.5 * h) * eps_s
            eps_m = eps_fn(batch_t(t_m, u), u)
            x_new = (alpha(t_t) / alpha(t_s)) * x - sigma(t_t) * jnp.expm1(h) * eps_m
        return x_new, None

    x, _ = jax.lax.scan(step, x_T, jnp.arange(steps))
    return x
