"""Stochastic differential equations for score-based generative models.

TPU-native redesign of the reference SDE classes (VESDE / VPSDE / SUBVPSDE,
see /root/reference/flowfusion/diffusion.py:818-1366): each SDE is a frozen
dataclass of static floats whose methods are pure jittable functions of
``(t, x)``.  No buffers, no modules, no device state — an SDE instance is a
hashable static argument, so it can close over ``jit``/``vmap``/``pjit``
boundaries for free.

Conventions (identical to the reference):
  * t = 0 is data, t = T is noise/base (diffusion.py time convention).
  * ``marginal_prob_scalars(t) -> (nu, eta)`` with
    p[x(t)|x(0)] = N(nu(t) x(0), eta(t)^2).
  * ``prior_log_prob`` returns the per-dimension log density of the base
    distribution (summed over trailing dims by callers, matching
    ``torch.distributions.Normal(...).log_prob`` elementwise semantics).

All math is float32 by default (reference contract, SURVEY.md §2.6.6).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["SDE", "VESDE", "VPSDE", "SUBVPSDE"]

_LOG_2PI = math.log(2.0 * math.pi)


def _bcast_right(a: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a per-batch scalar ``a`` of shape (B,) against x of shape (B, ...)."""
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim))


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base class: defines the shared API surface.

    Subclasses provide ``sigma``, ``drift``, ``diffusion``,
    ``marginal_prob_scalars``, and the prior.
    """

    T: float = 1.0
    epsilon: float = 1e-3

    # --- marginal transition kernel -------------------------------------
    def marginal_prob_scalars(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(nu(t), eta(t)): mean coefficient and std of p[x(t)|x(0)]."""
        raise NotImplementedError

    def sigma(self, t: jax.Array) -> jax.Array:
        """Marginal standard deviation eta(t)."""
        return self.marginal_prob_scalars(t)[1]

    def marginal_prob(self, t: jax.Array, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Mean and std of p[x(t)|x(0)], broadcast against ``x``.

        Mirrors reference ``marginal_prob`` (diffusion.py:1158-1180).
        """
        nu, eta = self.marginal_prob_scalars(t)
        return _bcast_right(nu, x) * x, _bcast_right(eta, x) * jnp.ones_like(x)

    def sample_marginal(self, key: jax.Array, t: jax.Array, x0: jax.Array) -> jax.Array:
        """Draw x(t) ~ p[x(t)|x(0)] (reference diffusion.py:960-985)."""
        z = jax.random.normal(key, x0.shape, x0.dtype)
        nu, eta = self.marginal_prob_scalars(t)
        return _bcast_right(nu, x0) * x0 + _bcast_right(eta, x0) * z

    # --- SDE coefficients ----------------------------------------------
    def drift(self, t: jax.Array, x: jax.Array) -> jax.Array:
        """Forward-SDE drift f(x, t)."""
        raise NotImplementedError

    def diffusion(self, t: jax.Array, x: jax.Array) -> jax.Array:
        """Forward-SDE diffusion g(t), broadcast to ``x``'s shape."""
        raise NotImplementedError

    def drift_coefficient(self, t: jax.Array) -> jax.Array:
        """Scalar a(t) with drift(t, x) = a(t) x.

        All three families have affine (state-proportional) drift; the
        fused Pallas kernels exploit this to fold the SDE into two scalars
        per RHS evaluation (kernels/fused_mlp.py).
        """
        raise NotImplementedError

    def diffusion_squared_scalar(self, t: jax.Array) -> jax.Array:
        """Scalar g(t)^2 (the diffusion is state-independent)."""
        raise NotImplementedError

    # --- prior (base density at t=T) ------------------------------------
    @property
    def prior_scale(self) -> float:
        """Std of the N(0, s^2) base distribution."""
        return 1.0

    # --- log-SNR parametrization (exponential integrators) ---------------
    def log_snr(self, t: jax.Array) -> jax.Array:
        """lambda(t) = log(nu(t) / eta(t)) — the DPM-Solver half-log-SNR."""
        nu, eta = self.marginal_prob_scalars(t)
        return jnp.log(nu) - jnp.log(eta)

    def t_of_log_snr(self, lam: jax.Array) -> jax.Array:
        """Inverse of ``log_snr`` (defined per family)."""
        raise NotImplementedError

    def prior_log_prob(self, x: jax.Array) -> jax.Array:
        """Elementwise log N(x | 0, prior_scale^2)."""
        s = self.prior_scale
        return -0.5 * (x / s) ** 2 - math.log(s) - 0.5 * _LOG_2PI

    def prior_sample(self, key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
        """Draw from the N(0, prior_scale^2) base distribution."""
        return jax.random.normal(key, shape, dtype) * self.prior_scale


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE (reference diffusion.py:818-1003).

    sigma(t) = sigma_min (sigma_max/sigma_min)^(t/T); f = 0;
    g(t) = sigma(t) sqrt(2 log(sigma_max/sigma_min) / T);
    prior N(0, sigma_max^2).
    """

    sigma_min: float = 1e-2
    sigma_max: float = 10.0
    T: float = 1.0
    epsilon: float = 1e-5

    def sigma(self, t: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** (t / self.T)

    def drift(self, t: jax.Array, x: jax.Array) -> jax.Array:
        return jnp.zeros_like(x)

    def diffusion(self, t: jax.Array, x: jax.Array) -> jax.Array:
        g = self.sigma(t) * math.sqrt(
            2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)) / self.T
        )
        return _bcast_right(g, x) * jnp.ones_like(x)

    def drift_coefficient(self, t: jax.Array) -> jax.Array:
        return jnp.zeros_like(jnp.asarray(t, jnp.float32))

    def diffusion_squared_scalar(self, t: jax.Array) -> jax.Array:
        return self.sigma(t) ** 2 * (
            2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)) / self.T
        )

    def marginal_prob_scalars(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        t = jnp.asarray(t, jnp.float32)
        return jnp.ones_like(t), self.sigma(t)

    def t_of_log_snr(self, lam: jax.Array) -> jax.Array:
        # lambda = -log sigma(t)  =>  t = T log(e^-lam / sigma_min) / log(r)
        sigma = jnp.exp(-lam)
        return (
            self.T
            * jnp.log(sigma / self.sigma_min)
            / math.log(self.sigma_max / self.sigma_min)
        )

    @property
    def prior_scale(self) -> float:
        return self.sigma_max


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE (reference diffusion.py:1006-1180).

    beta(t) = beta_min + (beta_max - beta_min) t/T; f = -beta(t) x / 2;
    g = sqrt(beta(t)); marginal scalars nu = exp(-B(t)/2),
    eta = sqrt(1 - exp(-B(t))) with B(t) = int_0^t beta (Song+2021 eq. 33);
    prior N(0, 1).
    """

    beta_min: float = 0.1
    beta_max: float = 20.0
    T: float = 1.0
    epsilon: float = 1e-3

    def beta(self, t: jax.Array) -> jax.Array:
        """Linear noise schedule beta(t) (reference diffusion.py:1060-1082)."""
        t = jnp.asarray(t, jnp.float32)
        return self.beta_min + (self.beta_max - self.beta_min) * (t / self.T)

    def _int_beta(self, t: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        return 0.5 * (self.beta_max - self.beta_min) * t**2 / self.T + self.beta_min * t

    def drift(self, t: jax.Array, x: jax.Array) -> jax.Array:
        return -0.5 * _bcast_right(self.beta(t), x) * x

    def diffusion(self, t: jax.Array, x: jax.Array) -> jax.Array:
        return _bcast_right(jnp.sqrt(self.beta(t)), x) * jnp.ones_like(x)

    def drift_coefficient(self, t: jax.Array) -> jax.Array:
        return -0.5 * self.beta(t)

    def diffusion_squared_scalar(self, t: jax.Array) -> jax.Array:
        return self.beta(t)

    def marginal_prob_scalars(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        log_coeff = self._int_beta(t)
        # -expm1 instead of the reference's 1 - exp: equal in exact math,
        # far more accurate in float32 for small t.
        std = jnp.sqrt(-jnp.expm1(-log_coeff))
        return jnp.exp(-0.5 * log_coeff), std

    def _t_of_int_beta(self, B: jax.Array) -> jax.Array:
        """Invert B(t) = a t^2 + b t for t >= 0 using the
        cancellation-free root 2B / (b + sqrt(b^2 + 4 a B)) — exact for
        a -> 0 (constant-beta schedules; the textbook -b + sqrt form is
        0/0 there and loses precision for small B)."""
        a = 0.5 * (self.beta_max - self.beta_min) / self.T
        b = self.beta_min
        return 2.0 * B / (b + jnp.sqrt(b**2 + 4.0 * a * B))

    def t_of_log_snr(self, lam: jax.Array) -> jax.Array:
        # lambda = -0.5 log(e^{B} - 1)  =>  B = log1p(e^{-2 lambda});
        # B(t) = (bmax-bmin) t^2 / (2T) + bmin t  solved for t >= 0.
        B = jnp.log1p(jnp.exp(-2.0 * lam))
        return self._t_of_int_beta(B)


@dataclasses.dataclass(frozen=True)
class SUBVPSDE(VPSDE):
    """Sub-variance-preserving SDE (reference diffusion.py:1183-1366).

    Same beta/f as VPSDE; g = sqrt(beta(t)(1 - exp(-2 B(t)~)));
    eta = 1 - exp(-B(t)) (no square root); prior N(0, 1).
    """

    def diffusion(self, t: jax.Array, x: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        discount = -jnp.expm1(
            -2.0 * self.beta_min * t - (self.beta_max - self.beta_min) * t**2 / self.T
        )
        return _bcast_right(jnp.sqrt(self.beta(t) * discount), x) * jnp.ones_like(x)

    def diffusion_squared_scalar(self, t: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        discount = -jnp.expm1(
            -2.0 * self.beta_min * t - (self.beta_max - self.beta_min) * t**2 / self.T
        )
        return self.beta(t) * discount

    def marginal_prob_scalars(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        log_coeff = self._int_beta(t)
        std = -jnp.expm1(-log_coeff)
        return jnp.exp(-0.5 * log_coeff), std

    def t_of_log_snr(self, lam: jax.Array) -> jax.Array:
        # eta = 1 - e^{-B}: with u = e^{-B/2}, e^lam = u / (1 - u^2)
        #  =>  u = 2 e^lam / (1 + sqrt(1 + 4 e^{2 lam})),  B = -2 log u.
        # (the textbook (sqrt(1+4r^2)-1)/(2r) form catastrophically
        # cancels for negative lambda: at r ~ 1e-4 float32 rounds
        # 1 + 4r^2 to 1 and returns u = 0 -> B = inf -> NaN samples)
        r = jnp.exp(lam)
        u = 2.0 * r / (1.0 + jnp.sqrt(1.0 + 4.0 * r**2))
        B = -2.0 * jnp.log(u)
        return self._t_of_int_beta(B)
