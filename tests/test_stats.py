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


@pytest.mark.slow
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


def test_summarize_stats_per_sample():
    """summarize_stats handles the (B,)-shaped per-sample SolverStats from
    the per-sample solvers (regression: TypeError on non-scalar arrays)."""
    import jax.numpy as jnp

    from flowfusion_tpu.ops.integrate import SolverStats
    from flowfusion_tpu.utils.diagnostics import summarize_stats

    scalar = SolverStats(
        n_func_evals=jnp.asarray(100),
        n_accepted=jnp.asarray(12),
        n_rejected=jnp.asarray(3),
        succeeded=jnp.asarray(True),
    )
    d = summarize_stats(scalar)
    assert d["n_func_evals"] == 100 and d["succeeded"] is True

    per_sample = SolverStats(
        n_func_evals=jnp.asarray([100, 140, 80]),
        n_accepted=jnp.asarray([12, 17, 9]),
        n_rejected=jnp.asarray([3, 5, 1]),
        succeeded=jnp.asarray([True, True, False]),
    )
    d = summarize_stats(per_sample)
    assert d["n_samples"] == 3
    assert d["n_func_evals_total"] == 320
    assert d["n_failed_samples"] == 1
    assert d["succeeded"] is False


def test_gmm_weights_normalized_between_sample_and_log_prob():
    """GMM.log_prob and GMM.sample must describe the same distribution
    even for unnormalized weights (regression: log_prob used raw weights
    while sample normalized them)."""
    import jax
    import jax.numpy as jnp

    from flowfusion_tpu.utils.data import GMM

    g1 = GMM(weights=(2.0, 3.0), means=((0.0, 0.0), (4.0, 4.0)),
             covs=(((1.0, 0.0), (0.0, 1.0)), ((1.0, 0.0), (0.0, 1.0))))
    g2 = GMM(weights=(0.4, 0.6), means=g1.means, covs=g1.covs)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 3
    np.testing.assert_allclose(
        np.asarray(g1.log_prob(x)), np.asarray(g2.log_prob(x)), rtol=1e-6
    )


def test_demo_gmm_matches_independent_numpy_oracle():
    """utils.data.DEMO_GMM and the float64 oracle in tests/oracles.py
    describe the reference notebooks' mixture; cross-check them against
    each other so neither copy can silently diverge."""
    import jax

    from flowfusion_tpu.utils.data import DEMO_GMM
    from oracles import gmm_log_prob, gmm_sample

    x = np.asarray(gmm_sample(np.random.default_rng(0), 512), np.float32)
    lp_lib = np.asarray(DEMO_GMM.log_prob(x))
    lp_oracle = gmm_log_prob(x)
    np.testing.assert_allclose(lp_lib, lp_oracle, rtol=1e-5, atol=1e-5)

    # two-sample sanity: library sampler and oracle sampler agree in
    # mean/cov to Monte-Carlo tolerance
    s_lib = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(0), 20000))
    s_orc = gmm_sample(np.random.default_rng(1), 20000)
    np.testing.assert_allclose(s_lib.mean(0), s_orc.mean(0), atol=0.05)
    np.testing.assert_allclose(
        np.cov(s_lib.T), np.cov(s_orc.T), atol=0.08
    )


def test_train_val_test_split_partitions():
    from flowfusion_tpu.utils.data import train_val_test_split

    x = jnp.arange(100.0)[:, None]
    tr, va, te = train_val_test_split(jax.random.PRNGKey(0), x)
    assert tr.shape[0] == 25 and va.shape[0] == 25 and te.shape[0] == 50
    merged = np.sort(np.concatenate([tr, va, te]).ravel())
    np.testing.assert_array_equal(merged, np.arange(100.0))


def test_assert_all_finite_names_the_bad_leaf():
    from flowfusion_tpu.utils.diagnostics import assert_all_finite

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_all_finite(good, "params")  # no raise
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match=r"params.*\['b'\]\['c'\]"):
        assert_all_finite(bad, "params")


def test_trace_annotation_and_timer():
    from flowfusion_tpu.utils.diagnostics import Timer, trace_annotation

    with trace_annotation("unit-test-region"):
        y = jnp.sum(jnp.ones((8, 8)))
    with Timer() as t:
        t.block_on(y)
    assert t.seconds >= 0.0


def test_data_utilities_edge_cases():
    """GMM validation, robust log-density, split remainders, and the
    constant-column standardization guard."""
    from flowfusion_tpu.utils.data import (
        GMM,
        DEMO_GMM,
        standardization_stats,
        train_val_test_split,
    )

    # construction-time validation
    with pytest.raises(ValueError, match="positive"):
        GMM(weights=(0.4, -0.6), means=((0.0,), (1.0,)), covs=(((1.0,),), ((1.0,),)))
    with pytest.raises(ValueError, match="positive definite"):
        GMM(weights=(1.0,), means=((0.0, 0.0),),
            covs=(((0.5, 0.9), (0.9, 0.5)),))

    # single unbatched point accepted (parity with the numpy oracle)
    lp1 = DEMO_GMM.log_prob(jnp.asarray([0.0, 0.0]))
    lp2 = DEMO_GMM.log_prob(jnp.asarray([[0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2))

    # thirds of 9 rows split 3/3/3 (int() truncation gave 2/2/5)
    x = jnp.arange(18.0).reshape(9, 2)
    tr, va, te = train_val_test_split(
        jax.random.PRNGKey(0), x, fractions=(1 / 3, 1 / 3, 1 / 3)
    )
    assert (tr.shape[0], va.shape[0], te.shape[0]) == (3, 3, 3)
    with pytest.raises(ValueError, match="summing to 1"):
        train_val_test_split(jax.random.PRNGKey(0), x, fractions=(0.5, 0.6, 0.1))

    # constant column: scale 1.0, not 0 -> NaN downstream
    xc = jnp.concatenate(
        [jnp.ones((10, 1)), jnp.arange(10.0)[:, None]], axis=1
    )
    shift, scale = standardization_stats(xc)
    assert float(scale[0]) == 1.0 and float(scale[1]) > 0.0
    assert np.all(np.isfinite(np.asarray((xc - shift) / scale)))
