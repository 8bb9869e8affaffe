"""Toy data + dataset helpers mirroring the reference demo workflows.

The 2-component 2D Gaussian mixture (weights 0.4/0.6) is the reference's
de-facto test oracle (demo_diffusion.ipynb cell 2, SURVEY.md §4): it has a
closed-form log density the demos validate against.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GMM", "DEMO_GMM", "REFERENCE_GMM", "ConditionalPopulation",
           "CONDITIONAL_POP", "train_val_test_split",
           "standardization_stats"]


@dataclasses.dataclass(frozen=True)
class GMM:
    """K-component Gaussian mixture with exact sampling and log density."""

    weights: Tuple[float, ...]
    means: Tuple[Tuple[float, ...], ...]
    covs: Tuple[Tuple[Tuple[float, ...], ...], ...]

    def __post_init__(self):
        w = np.asarray(self.weights, np.float64)
        mu = np.asarray(self.means, np.float64)
        cov = np.asarray(self.covs, np.float64)
        if np.any(w <= 0):
            raise ValueError(f"mixture weights must be positive; got {w}")
        if not (len(w) == mu.shape[0] == cov.shape[0]):
            raise ValueError(
                f"component count mismatch: {len(w)} weights, "
                f"{mu.shape[0]} means, {cov.shape[0]} covs"
            )
        if cov.shape[1:] != (mu.shape[1], mu.shape[1]):
            raise ValueError(f"cov shape {cov.shape[1:]} vs dim {mu.shape[1]}")
        if not np.allclose(cov, np.swapaxes(cov, 1, 2)):
            raise ValueError("covariances must be symmetric")
        if np.any(np.linalg.eigvalsh(cov) <= 0):
            raise ValueError("covariances must be positive definite")

    @property
    def dim(self) -> int:
        return len(self.means[0])

    def _np(self):
        w = np.asarray(self.weights, np.float64)
        # Normalize so sample() (jax.random.choice normalizes p) and
        # log_prob() describe the SAME distribution even for weights that
        # do not sum to 1.
        return w / w.sum(), np.asarray(self.means), np.asarray(self.covs)

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        """Draw ``n`` mixture samples (component choice + Cholesky noise)."""
        w, mu, cov = self._np()
        kc, kz = jax.random.split(key)
        comps = jax.random.choice(kc, len(w), (n,), p=jnp.asarray(w))
        chols = jnp.asarray(np.linalg.cholesky(cov))
        z = jax.random.normal(kz, (n, self.dim))
        return jnp.asarray(mu)[comps] + jnp.einsum(
            "nij,nj->ni", chols[comps], z
        )

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Closed-form mixture log-density (the analytic test oracle).

        Accepts (n, D) batches or a single (D,) point.
        """
        w, mu, cov = self._np()
        x = jnp.atleast_2d(x)
        inv = jnp.asarray(np.linalg.inv(cov))
        # slogdet: robust for small determinants (det underflows first)
        logdet = jnp.asarray(np.linalg.slogdet(cov)[1])
        diff = x[:, None, :] - jnp.asarray(mu)[None, :, :]  # (n, K, D)
        maha = jnp.einsum("nki,kij,nkj->nk", diff, inv, diff)
        logps = (
            jnp.log(jnp.asarray(w))[None, :]
            - 0.5 * (maha + logdet[None, :] + self.dim * jnp.log(2 * jnp.pi))
        )
        return jax.scipy.special.logsumexp(logps, axis=1)


# The REFERENCE notebooks' mixture (demo_diffusion.ipynb cell 3 ==
# demo_flow.ipynb cell 3: well-separated modes at (-3, 3) and (2, -2)).
# This is the distribution the reference's own demo quality numbers
# (e.g. the 0.037% summed-density error) are measured against — use it
# for any reference-comparable statistical-quality claim.
#
# One documented delta: the notebooks SAMPLE component 2 as ``x @ L``
# with L = chol(C), which draws from covariance L^T L = [[2.405, .804],
# [.804, 1.595]] while their analytic oracle scores the stated C —
# i.e. the reference demos train on one distribution and score against
# another (KL ~ 0.027 nats/row on that component).  ``GMM.sample`` here
# draws L z (the density actually scored), so mirror numbers carry no
# such mismatch; benchmarks/quality_ablation.py replicates the
# notebook's ``x @ L`` faithfully for its controlled comparison.
REFERENCE_GMM = GMM(
    weights=(0.4, 0.6),
    means=((-3.0, 3.0), (2.0, -2.0)),
    covs=(((1.0, 0.0), (0.0, 1.0)), ((2.0, 0.9), (0.9, 2.0))),
)

# This package's own demo mixture: two CLOSE, overlapping components —
# a deliberately harder density (sharper curvature between modes) used
# by the bench/flagship field and most tests.  NB round 3 mistakenly
# labeled this "the demo notebooks' mixture" and measured mirror density
# errors against it; quality numbers on DEMO_GMM are NOT comparable to
# the reference notebooks' (see benchmarks/quality_ablation.py).
DEMO_GMM = GMM(
    weights=(0.4, 0.6),
    means=((-1.0, -1.0), (1.0, 1.0)),
    covs=(((0.5, 0.2), (0.2, 0.5)), ((0.7, -0.3), (-0.3, 0.4))),
)


def train_val_test_split(key: jax.Array, x: jax.Array, fractions=(0.25, 0.25, 0.5)):
    """Random split (reference demos use 25:25:50, demo_diffusion cell 5).

    Mirrors torch's random_split remainder handling: lengths are floored
    and the leftover rows are distributed round-robin, so e.g. thirds of
    n=9 give 3/3/3 (plain int() truncation gave 2/2/5 — float 1/3 * 9 is
    2.999...).  ``fractions`` must sum to 1.
    """
    if len(fractions) != 3 or abs(sum(fractions) - 1.0) > 1e-6:
        raise ValueError(f"fractions must be 3 values summing to 1; got {fractions}")
    n = x.shape[0]
    perm = jax.random.permutation(key, n)
    lengths = [int(f * n) for f in fractions]
    for i in range(n - sum(lengths)):
        lengths[i % 3] += 1
    n_train, n_val, _ = lengths
    return (
        x[perm[:n_train]],
        x[perm[n_train : n_train + n_val]],
        x[perm[n_train + n_val :]],
    )


def standardization_stats(x: jax.Array):
    """(shift, scale) = per-dimension mean and std.

    Unbiased (ddof=1) std, matching the reference demos' torch
    ``x.std(0)``.  Constant columns get scale 1.0 (centering only)
    instead of a silent divide-by-zero NaN downstream; so does a
    single-row dataset, whose ddof=1 std is NaN (``NaN < 1e-12`` is
    False, so a plain less-than guard would pass the NaN through and
    poison every standardized value).
    """
    std = jnp.std(x, axis=0, ddof=1)
    scale = jnp.where(jnp.isfinite(std) & (std > 1e-12), std, 1.0)
    return jnp.mean(x, axis=0), scale


@dataclasses.dataclass(frozen=True)
class ConditionalPopulation:
    """Alsing+2024-style synthetic conditional family with an analytic
    conditional density — the oracle for the BASELINE configs[4]
    workload (conditional density estimation at 1e6-row scale).

    theta | c is a curved heteroscedastic Gaussian: observables
    c ~ U(-1, 1)^3 drive a nonlinear 6-D mean (sin / tanh / quadratic /
    linear mix) and a sigmoid-modulated scale, standing in for the
    SPS/SED posterior families of the reference's production use-case
    (no torch analogue exists in /root/reference — its notebooks stop at
    2-D unconditional mixtures; SURVEY.md §5.7).

    The functional form is FROZEN: the committed conditional flagship
    checkpoints (benchmarks/conditional_ckpt*.npz) were trained on it,
    and tests/test_checkpoint_quality.py scores them against this
    analytic density — changing it silently invalidates both.
    """

    theta_dim: int = 6
    cond_dim: int = 3

    def __post_init__(self):
        if (self.theta_dim, self.cond_dim) != (6, 3):
            raise ValueError(
                "ConditionalPopulation is a FROZEN 6-D/3-cond family (the "
                "committed checkpoints and gates score against exactly "
                "this functional form) — the dims are informational, not "
                f"configurable; got ({self.theta_dim}, {self.cond_dim})"
            )

    def mean_scale(self, c: jax.Array):
        """Analytic (mean, scale) of theta | c, each (n, 6)."""
        mean = jnp.concatenate(
            [
                jnp.sin(2 * c),
                jnp.tanh(c[:, :1] * c[:, 1:2]),
                c[:, 2:] ** 2,
                (c[:, :1] + c[:, 2:]) / 2,
            ],
            axis=1,
        )
        scale = 0.3 + 0.2 * jax.nn.sigmoid(jnp.concatenate([c, -c], axis=1))
        return mean, scale

    def sample(self, key: jax.Array, n: int):
        """(theta, c) draws; same key layout as the original demo
        (kc for c, kz for the noise) so committed artifacts reproduce."""
        kc, kz = jax.random.split(key)
        c = jax.random.uniform(
            kc, (n, self.cond_dim), minval=-1.0, maxval=1.0
        )
        mean, scale = self.mean_scale(c)
        z = jax.random.normal(kz, (n, self.theta_dim))
        return mean + scale * z, c

    def log_prob(self, theta: jax.Array, c: jax.Array) -> jax.Array:
        """Exact conditional log density log p(theta | c)."""
        mean, scale = self.mean_scale(c)
        return jnp.sum(
            -0.5 * ((theta - mean) / scale) ** 2
            - jnp.log(scale)
            - 0.5 * jnp.log(2 * jnp.pi),
            axis=1,
        )


#: The committed conditional-flagship field (see ConditionalPopulation).
CONDITIONAL_POP = ConditionalPopulation()
