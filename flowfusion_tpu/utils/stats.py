"""Statistical validation utilities: two-sample tests for generated samples.

The reference validates samples only visually (hexbin plots,
demo_diffusion.ipynb cells 12-21; SURVEY.md §4).  These utilities make the
check quantitative and automatable:

  * ``energy_distance`` — Szekely & Rizzo's E-statistic between two sample
    sets: zero iff the distributions coincide; a consistent two-sample
    statistic in any dimension;
  * ``energy_distance_test`` — permutation p-value for H0: same
    distribution.

Both are jittable O(n^2) kernels (pairwise distances on the device) —
use subsamples for very large sets.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["energy_distance", "energy_distance_test"]


def _mean_pdist(a: jax.Array, b: jax.Array) -> jax.Array:
    d2 = (
        jnp.sum(a**2, axis=1)[:, None]
        + jnp.sum(b**2, axis=1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)))


def energy_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """E(x, y) = 2 E|X-Y| - E|X-X'| - E|Y-Y'|  (>= 0; 0 iff same law)."""
    return 2.0 * _mean_pdist(x, y) - _mean_pdist(x, x) - _mean_pdist(y, y)


def energy_distance_test(
    key: jax.Array, x: jax.Array, y: jax.Array, n_permutations: int = 200
) -> Tuple[jax.Array, jax.Array]:
    """Permutation test of H0: x and y are drawn from the same distribution.

    Returns (statistic, p_value).  Sample sizes must match for the pooled
    permutation to be exchangeable-symmetric (subsample beforehand).
    """
    n = x.shape[0]
    if y.shape[0] != n:
        raise ValueError("x and y must have equal sample sizes")
    stat = energy_distance(x, y)
    pooled = jnp.concatenate([x, y], axis=0)

    def one(k):
        perm = jax.random.permutation(k, 2 * n)
        shuffled = pooled[perm]
        return energy_distance(shuffled[:n], shuffled[n:])

    null = jax.lax.map(one, jax.random.split(key, n_permutations))
    p = (1.0 + jnp.sum(null >= stat)) / (n_permutations + 1.0)
    return stat, p
