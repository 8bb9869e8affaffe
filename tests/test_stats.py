"""Two-sample validation utilities + an end-to-end sampler check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.utils.data import DEMO_GMM
from flowfusion_tpu.utils.stats import energy_distance, energy_distance_test


def test_energy_distance_zero_for_identical():
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 2))
    assert abs(float(energy_distance(x, x))) < 1e-5


def test_energy_distance_discriminates():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (512, 2))
    y_same = jax.random.normal(k2, (512, 2))
    y_diff = jax.random.normal(k3, (512, 2)) + 1.5
    assert float(energy_distance(x, y_diff)) > 10 * abs(
        float(energy_distance(x, y_same))
    )


def test_permutation_test_calibrated():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (128, 2))
    y = jax.random.normal(k2, (128, 2))
    _, p_same = energy_distance_test(k3, x, y, n_permutations=99)
    assert float(p_same) > 0.01  # H0 true: should rarely reject

    y_shift = y + 2.0
    _, p_diff = energy_distance_test(k3, x, y_shift, n_permutations=99)
    assert float(p_diff) < 0.02  # H0 false: should reject


def test_analytic_score_em_samples_pass_two_sample_test():
    """EM sampling with the true score produces samples indistinguishable
    from the data distribution under the energy test (SURVEY.md §4's
    'samples match in distribution' criterion, made automatic)."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    @dataclasses.dataclass(frozen=True)
    class TrueScore:
        sde: object

        def apply(self, params, t, x, conditional=None):
            nu, eta = self.sde.marginal_prob_scalars(jnp.asarray(t, jnp.float32))
            var = nu**2 + eta**2
            return -x / var.reshape((-1, 1))

    sde = VESDE()
    m = ScoreModel(params={}, net=TrueScore(sde=sde), no_sigma=True, sde=sde)
    res = m.sample_sde(jax.random.PRNGKey(0), (512, 2), steps=300)
    data = jax.random.normal(jax.random.PRNGKey(1), (512, 2))
    _, p = energy_distance_test(jax.random.PRNGKey(2), res.x_mean, data, n_permutations=99)
    assert float(p) > 0.01, f"two-sample test rejected: p={float(p)}"
