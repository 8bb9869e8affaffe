"""Unit tests for utils/data.py helpers (the GMM/conditional families are
covered by the parity, density, and end-to-end suites; this file pins the
small pure helpers' edge cases)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowfusion_tpu.utils.data import standardization_stats


def test_standardization_stats_matches_torch_convention():
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(0), (64, 3)) + 5.0
    shift, scale = standardization_stats(x)
    np.testing.assert_allclose(
        np.asarray(shift), np.asarray(x).mean(0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scale), np.asarray(x).std(0, ddof=1), rtol=1e-6
    )


def test_standardization_stats_constant_column_gets_unit_scale():
    x = jnp.stack(
        [jnp.ones(16), jnp.arange(16, dtype=jnp.float32)], axis=1
    )
    _, scale = standardization_stats(x)
    assert float(scale[0]) == 1.0
    assert float(scale[1]) > 1.0


def test_standardization_stats_single_row_gets_unit_scale():
    """ddof=1 std of one row is NaN; the guard must return 1.0, not
    propagate NaN into every standardized value downstream."""
    x = jnp.asarray([[2.0, -3.0]])
    shift, scale = standardization_stats(x)
    np.testing.assert_allclose(np.asarray(shift), [2.0, -3.0])
    np.testing.assert_array_equal(np.asarray(scale), [1.0, 1.0])
