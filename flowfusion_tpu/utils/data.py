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

__all__ = ["GMM", "DEMO_GMM", "train_val_test_split", "standardization_stats"]


@dataclasses.dataclass(frozen=True)
class GMM:
    """K-component Gaussian mixture with exact sampling and log density."""

    weights: Tuple[float, ...]
    means: Tuple[Tuple[float, ...], ...]
    covs: Tuple[Tuple[Tuple[float, ...], ...], ...]

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
        """Closed-form mixture log-density (the analytic test oracle)."""
        w, mu, cov = self._np()
        inv = jnp.asarray(np.linalg.inv(cov))
        logdet = jnp.asarray(np.log(np.linalg.det(cov)))
        diff = x[:, None, :] - jnp.asarray(mu)[None, :, :]  # (n, K, D)
        maha = jnp.einsum("nki,kij,nkj->nk", diff, inv, diff)
        logps = (
            jnp.log(jnp.asarray(w))[None, :]
            - 0.5 * (maha + logdet[None, :] + self.dim * jnp.log(2 * jnp.pi))
        )
        return jax.scipy.special.logsumexp(logps, axis=1)


# The demo notebooks' mixture.
DEMO_GMM = GMM(
    weights=(0.4, 0.6),
    means=((-1.0, -1.0), (1.0, 1.0)),
    covs=(((0.5, 0.2), (0.2, 0.5)), ((0.7, -0.3), (-0.3, 0.4))),
)


def train_val_test_split(key: jax.Array, x: jax.Array, fractions=(0.25, 0.25, 0.5)):
    """Random split (reference demos use 25:25:50, demo_diffusion cell 5)."""
    n = x.shape[0]
    perm = jax.random.permutation(key, n)
    n_train = int(fractions[0] * n)
    n_val = int(fractions[1] * n)
    return (
        x[perm[:n_train]],
        x[perm[n_train : n_train + n_val]],
        x[perm[n_train + n_val :]],
    )


def standardization_stats(x: jax.Array):
    """(shift, scale) = per-dimension mean and std."""
    return jnp.mean(x, axis=0), jnp.std(x, axis=0)
