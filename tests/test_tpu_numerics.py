"""On-device (real TPU) numerics regression tests — the ``tpu`` tier.

Run with ``RUN_TPU=1 python -m pytest tests/ -q`` on a machine with a TPU
backend; every other tier skips these (tests/README.md).

The CPU suite runs the Pallas kernels in interpret mode, which cannot
catch MXU-precision regressions: inside Pallas, f32 ``jnp.dot`` defaults
to a SINGLE bf16 MXU pass (~1e-3 relative error), so a silent loss of the
HIGHEST / 3-pass-split request would corrupt parity while every CPU test
stays green (BENCHMARKS.md "Accuracy").  These tests pin the healthy
on-device signature: ~1e-7..1e-5 RHS deviation, identical adaptive step
counts, and likelihood agreement far below the rtol=1e-5 truncation
floor.  bench.py asserts the same bounds before every headline run; this
file makes them a first-class test tier with per-check failure isolation.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":  # pragma: no cover - tier guard
    pytest.skip(
        "tpu tier needs a real TPU backend (RUN_TPU=1 on a TPU host)",
        allow_module_level=True,
    )


@pytest.fixture(scope="module")
def trained():
    """Flagship model + standardized data, from the committed demo-grade
    checkpoint when present (bench.py's exact workload, so these bounds
    guard exactly what the headline measures); falls back to the quick
    DSM-trained field when the artifact is absent."""
    import bench

    model, x, _ = bench.build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    return model, x


def _fused_variants(model):
    m_fused = dataclasses.replace(
        model, trace_mode="hutchinson", use_fused_kernel=True
    )
    m_plain = dataclasses.replace(m_fused, use_fused_kernel=False)
    m_3pass = dataclasses.replace(m_fused, kernel_compute_dtype="highf32")
    return m_fused, m_plain, m_3pass


def test_fused_rhs_matches_plain_on_device(trained):
    """Single-RHS deviation bounds (drift + Hutchinson divergence) for the
    HIGHEST kernel and the 3-pass highf32 kernel vs plain XLA."""
    from flowfusion_tpu.kernels.fused_mlp import fused_drift
    from flowfusion_tpu.ops import trace as trace_lib

    model, x = trained
    _, m_plain, _ = _fused_variants(model)
    xs = x[:2048]
    e = trace_lib.make_probes("hutchinson", jax.random.PRNGKey(7), xs)[0]
    c0, c1 = model._fused_coeffs(0.5)

    def plain_rhs(xx):
        return m_plain.ode_drift(0.5, xx)

    drift_p, div_p = trace_lib.hutchinson_divergence(plain_rhs, xs, e)
    scale = float(jnp.max(jnp.abs(drift_p))) + 1e-12
    div_scale = float(jnp.max(jnp.abs(div_p))) + 1e-12

    drift_f, div_f = fused_drift(
        model.params, model.net, jnp.asarray(0.5), xs, e=e, c0=c0, c1=c1
    )
    assert float(jnp.max(jnp.abs(drift_f - drift_p))) / scale <= 1e-5
    assert float(jnp.max(jnp.abs(div_f - div_p))) / div_scale <= 1e-4

    drift_3, div_3 = fused_drift(
        model.params, model.net, jnp.asarray(0.5), xs, e=e, c0=c0, c1=c1,
        compute_dtype="highf32",
    )
    # highf32 bounds sit at ~2x the values measured on the committed
    # demo-grade field (5.1e-5 / 1.3e-4 — the sharper trained score has
    # bigger activations than the old quick field's ~2e-5), still an
    # order under the ~1e-3 bf16-trap signature (bench.py has the same
    # calibration note).
    assert float(jnp.max(jnp.abs(drift_3 - drift_p))) / scale <= 1.2e-4
    assert float(jnp.max(jnp.abs(div_3 - div_p))) / div_scale <= 3e-4


def test_solver_step_counts_and_logprob_agree(trained):
    """Identical math must give identical adaptive step counts, and the
    kernels' likelihoods must sit far below the rtol=1e-5 truncation
    floor; a bf16-default regression inflates NFE and |dlogp| by orders
    of magnitude."""
    model, x = trained
    m_fused, m_plain, m_3pass = _fused_variants(model)
    xs = x[:2048]
    k = jax.random.PRNGKey(7)

    solve = jax.jit(
        lambda m, xx, kk: m.log_prob(xx, key=kk, atol=1e-5, rtol=1e-5)
    )
    lp_f, st_f = solve(m_fused, xs, k)
    lp_p, st_p = solve(m_plain, xs, k)
    lp_3, st_3 = solve(m_3pass, xs, k)

    assert int(st_f.n_func_evals) == int(st_p.n_func_evals)
    assert int(st_3.n_func_evals) == int(st_p.n_func_evals)
    assert float(jnp.mean(jnp.abs(lp_f - lp_p))) <= 1e-4
    # 3pass measured 1.9e-4 on the committed field (bench.py calibration
    # note) — ~5x under the field's 9.8e-4 rtol=1e-5 truncation floor
    assert float(jnp.mean(jnp.abs(lp_3 - lp_p))) <= 5e-4


def test_em_fused_sampler_matches_scan_on_device(trained):
    """The fused EM sampler (hardware PRNG, different noise stream) must
    agree with the lax.scan reference sampler in distribution: first two
    moments of 50k samples from the same trained score field."""
    model, _ = trained

    n = 50_000
    res_scan = model.sample_sde(jax.random.PRNGKey(11), (n, 2), steps=100)
    res_kern = model.sample_sde_fused(jax.random.PRNGKey(12), (n, 2), steps=100)
    assert not bool(np.asarray(res_scan.nan_encountered).any())
    assert not bool(np.asarray(res_kern.nan_encountered).any())
    a = np.asarray(res_scan.x_mean)
    b = np.asarray(res_kern.x_mean)
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    # moment agreement at the two-sample Monte-Carlo scale (~1/sqrt(n)
    # with O(1) stds; 0.05 is ~10 sigma — catches systematic kernel
    # drift, not sampling noise)
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.05)
    np.testing.assert_allclose(np.cov(a.T), np.cov(b.T), atol=0.08)
