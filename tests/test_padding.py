"""pad-to-lanes transform: unsupported-width nets ride the fused kernel.

Closes the round-3 SIGILL corner (models/_common.fused_dispatch): on TPU an
exact-trace solve with e.g. units=(100, 100) used to fall through silently
to the plain-XLA exact graph — the family BENCHMARKS.md records as crashing
this platform's compiler.  Now every stock config is liftable into the
kernel envelope by zero-padding hidden widths to one uniform lane multiple
(kernels/fused_mlp.pad_to_lanes, exact because every kernel activation has
act(0) == 0), and the one remaining unsupported exact case (custom net /
wide features) raises with advice instead of crashing.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.kernels.fused_mlp import (
    fusable_config,
    fused_drift,
    pad_to_lanes,
    paddable_config,
    supports_config,
)
from flowfusion_tpu.models.nets import (
    ScoreMLPConfig,
    SymplecticMLPConfig,
    VelocityMLPConfig,
    apply_score_mlp,
    apply_symplectic_mlp,
    apply_velocity_mlp,
)

INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("units", [(100,), (100, 200), (192, 192), (30, 130, 7)])
def test_pad_to_lanes_score_forward_exact(units):
    cfg = ScoreMLPConfig(n_dimensions=2, units=units)
    params = cfg.init(jax.random.PRNGKey(0))
    pparams, pcfg = pad_to_lanes(params, cfg)
    assert supports_config(pcfg.units, pcfg.activation)
    assert pcfg.units == (max(-(-u // 128) * 128 for u in units),) * len(units)
    t = jnp.full((64,), 0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    out = apply_score_mlp(cfg, params, t, x)
    pout = apply_score_mlp(pcfg, pparams, t, x)
    # acts(0) == 0 => padded units are identically zero; adding zeros is
    # exact in floating point, so outputs agree to reassociation noise
    np.testing.assert_allclose(np.asarray(pout), np.asarray(out), atol=1e-6)
    # exact-trace semantics too: full Jacobian agreement
    J = jax.vmap(jax.jacfwd(lambda xx: apply_score_mlp(cfg, params, t[:1], xx[None])[0]))(x)
    Jp = jax.vmap(jax.jacfwd(lambda xx: apply_score_mlp(pcfg, pparams, t[:1], xx[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(J), atol=1e-6)


def test_pad_to_lanes_velocity_and_symplectic_forward_exact():
    vcfg = VelocityMLPConfig(target_dimension=3, hidden_units=(100, 100))
    vparams = vcfg.init(jax.random.PRNGKey(2))
    pv, pvcfg = pad_to_lanes(vparams, vcfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    t = jnp.full((32,), 0.7)
    np.testing.assert_allclose(
        np.asarray(apply_velocity_mlp(pvcfg, pv, t, x)),
        np.asarray(apply_velocity_mlp(vcfg, vparams, t, x)),
        atol=1e-6,
    )

    scfg = SymplecticMLPConfig(n_data_dims=2, units=(60, 60))
    sparams = scfg.init(jax.random.PRNGKey(4))
    ps, pscfg = pad_to_lanes(sparams, scfg)
    qp = jax.random.normal(jax.random.PRNGKey(5), (16, 4))
    np.testing.assert_allclose(
        np.asarray(apply_symplectic_mlp(pscfg, ps, t[:16], qp)),
        np.asarray(apply_symplectic_mlp(scfg, sparams, t[:16], qp)),
        atol=1e-6,
    )


def test_pad_to_lanes_noop_when_supported():
    cfg = ScoreMLPConfig(units=(128, 128))
    params = cfg.init(jax.random.PRNGKey(0))
    pparams, pcfg = pad_to_lanes(params, cfg)
    assert pcfg is cfg and pparams is params


def test_fused_drift_pads_unsupported_width():
    """units=(100,) — the old raise — now runs the kernel via padding."""
    cfg = ScoreMLPConfig(n_dimensions=2, units=(100, 100))
    params = cfg.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (48, 2))
    t = jnp.asarray(0.4)
    # exact divergence (the SIGILL family on TPU's plain graph)
    drift, div = fused_drift(
        params, cfg, t, x, exact_divergence=True, c0=-0.2, c1=0.8,
        tile=48, interpret=INTERPRET,
    )

    def f(xx):
        return -0.2 * xx + 0.8 * apply_score_mlp(
            cfg, params, jnp.full((1,), 0.4), xx[None]
        )[0]

    J = jax.vmap(jax.jacfwd(f))(x)
    expected_div = jnp.trace(J, axis1=-2, axis2=-1)
    expected_drift = jax.vmap(f)(x)
    np.testing.assert_allclose(np.asarray(drift), np.asarray(expected_drift), atol=2e-5)
    np.testing.assert_allclose(np.asarray(div), np.asarray(expected_div), rtol=1e-4, atol=2e-4)


def test_padded_exact_logprob_matches_plain():
    """Whole-solve parity: forced-fused exact log_prob on a padded-width
    model equals the plain-XLA exact solve (same solver, same steps)."""
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg = ScoreMLPConfig(n_dimensions=2, units=(100, 100))
    params = cfg.init(jax.random.PRNGKey(0))
    m_plain = ScoreModel(
        params=params, net=cfg, sde=VESDE(), trace_mode="exact",
        use_fused_kernel=False,
    )
    m_fused = dataclasses.replace(m_plain, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 2)) * 2.0
    call = jax.jit(lambda mm, xx: mm.log_prob(xx, atol=1e-5, rtol=1e-5))
    lp_plain, st_p = call(m_plain, x)
    lp_fused, st_f = call(m_fused, x)
    np.testing.assert_allclose(
        np.asarray(lp_fused), np.asarray(lp_plain), rtol=1e-4, atol=1e-3
    )
    assert int(st_p.n_accepted) == int(st_f.n_accepted)


def test_fusable_config_predicates():
    assert fusable_config((100,), "silu")
    assert fusable_config((128, 128), "silu")
    assert paddable_config((100, 200), "gelu")
    assert not fusable_config((128,), "softsign")
    assert not paddable_config((100,), "softsign")


def test_unpaddable_activation_raises():
    class FakeCfg:
        units = (100,)
        activation = "softsign"

    with pytest.raises(ValueError, match="cannot pad"):
        pad_to_lanes({"layers": []}, FakeCfg())


def test_tpu_exact_dispatch_never_silent(monkeypatch):
    """On (mocked) TPU, AUTO exact-trace dispatch either selects the fused
    kernel or raises with advice — the plain-XLA crash-family graph is
    unreachable without an explicit use_fused_kernel=False."""
    from flowfusion_tpu.models import _common
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    monkeypatch.setattr(_common.jax, "default_backend", lambda: "tpu")

    # paddable stock config: supported -> kernel on single-device
    cfg = ScoreMLPConfig(n_dimensions=2, units=(100, 100))
    m = ScoreModel(
        params=cfg.init(jax.random.PRNGKey(0)), net=cfg, sde=VESDE(),
        trace_mode="exact",
    )
    assert m._fused_supported(exact=True)
    if len(jax.devices()) == 1:
        assert m._fused_available(for_exact=True)
    else:
        # multi-device realm: loud raise, not a silent plain graph
        with pytest.raises(ValueError, match="per .?shard|data_parallel"):
            m._fused_available(for_exact=True)

    # outside the envelope (wide features under exact trace): raises with
    # estimator advice on any device count
    wide = ScoreMLPConfig(n_dimensions=20, units=(128, 128))
    mw = ScoreModel(
        params=wide.init(jax.random.PRNGKey(1)), net=wide, sde=VESDE(),
        trace_mode="exact",
    )
    assert not mw._fused_supported(exact=True)
    with pytest.raises(ValueError, match="hutchinson"):
        mw._fused_available(for_exact=True)

    # explicit opt-out still reaches the plain graph
    m_off = dataclasses.replace(mw, use_fused_kernel=False)
    assert m_off._fused_available(for_exact=True) is False

    # forward-only dispatch (sampling) for the wide model is unaffected
    assert mw._fused_supported(exact=False)
