"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.kernels.fused_mlp import (
    fused_drift,
    fused_drift_reference,
    supports_config,
)
from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp

INTERPRET = jax.default_backend() == "cpu"


def _setup(n_cond=0, units=(128, 128, 128)):
    cfg = ScoreMLPConfig(
        n_dimensions=2, n_conditionals=n_cond, units=units
    )
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_supports_config():
    assert supports_config((128, 128))
    assert supports_config((256, 256))
    assert not supports_config((128, 64))
    assert not supports_config((100,))


def test_fused_drift_matches_reference_forward():
    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    t = jnp.asarray(0.37)
    out = fused_drift(params, cfg, t, x, c0=-0.3, c1=0.7, tile=64, interpret=INTERPRET)
    expected = fused_drift_reference(params, cfg, t, x, c0=-0.3, c1=0.7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_fused_drift_matches_reference_with_tangent():
    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (64, 2)))
    t = jnp.asarray(0.8)
    drift, div = fused_drift(
        params, cfg, t, x, e=e, c0=-0.1, c1=1.3, tile=64, interpret=INTERPRET
    )
    drift_ref, div_ref = fused_drift_reference(
        params, cfg, t, x, e=e, c0=-0.1, c1=1.3
    )
    np.testing.assert_allclose(np.asarray(drift), np.asarray(drift_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(div), np.asarray(div_ref), rtol=1e-4, atol=2e-4)


def test_fused_drift_conditional():
    cfg, params = _setup(n_cond=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    c = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (32, 2)))
    t = jnp.asarray(0.5)
    drift, div = fused_drift(
        params, cfg, t, x, conditional=c, e=e, c1=0.9, tile=32, interpret=INTERPRET
    )
    # reference JVP must perturb only x, not the conditional
    from flowfusion_tpu.models.nets import apply_score_mlp

    def net(xx):
        return apply_score_mlp(cfg, params, jnp.full((32,), 0.5), xx, c)

    out, je = jax.jvp(net, (x,), (e,))
    np.testing.assert_allclose(np.asarray(drift), 0.9 * np.asarray(out), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(div), 0.9 * np.sum(np.asarray(je) * np.asarray(e), -1),
        rtol=1e-4, atol=2e-4,
    )


def test_fused_drift_ragged_batch_padding():
    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 2))  # not tile-aligned
    out = fused_drift(params, cfg, jnp.asarray(0.2), x, tile=32, interpret=INTERPRET)
    expected = fused_drift_reference(params, cfg, jnp.asarray(0.2), x)
    assert out.shape == (37, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_unsupported_config_raises():
    cfg, params = _setup(units=(100,))
    with pytest.raises(ValueError):
        fused_drift(params, cfg, jnp.asarray(0.5), jnp.ones((8, 2)), interpret=INTERPRET)


def test_fused_logprob_path_matches_unfused():
    """ScoreModel with use_fused_kernel=True must reproduce the plain-XLA
    Hutchinson log_prob (same probes, same solver)."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup()
    m_plain = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="hutchinson",
        use_fused_kernel=False,
    )
    m_fused = dataclasses.replace(m_plain, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 2))
    k = jax.random.PRNGKey(6)
    lp_plain, st_p = m_plain.log_prob(x, key=k, atol=1e-4, rtol=1e-4)
    lp_fused, st_f = m_fused.log_prob(x, key=k, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lp_fused), np.asarray(lp_plain), rtol=1e-4, atol=1e-3
    )
    # identical math => identical step counts
    assert int(st_p.n_accepted) == int(st_f.n_accepted)


def test_fused_sampling_paths_match():
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg, params = _setup()
    m_plain = ScoreModel(params=params, net=cfg, sde=VESDE(), use_fused_kernel=False)
    m_fused = dataclasses.replace(m_plain, use_fused_kernel=True)
    base = jax.random.normal(jax.random.PRNGKey(7), (16, 2))
    s_plain, _ = m_plain.sample_ode_from_base(base, atol=1e-4, rtol=1e-4)
    s_fused, _ = m_fused.sample_ode_from_base(base, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_plain), atol=1e-4)

    em_plain = m_plain.sample_sde(jax.random.PRNGKey(8), (16, 2), steps=10)
    em_fused = m_fused.sample_sde(jax.random.PRNGKey(8), (16, 2), steps=10)
    np.testing.assert_allclose(
        np.asarray(em_fused.x_mean), np.asarray(em_plain.x_mean), atol=1e-4
    )
