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


@pytest.mark.slow
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


def test_unsupported_width_now_pads():
    """units=(100,) used to raise; pad_to_lanes lifts it into the envelope
    (exactness covered in tests/test_padding.py)."""
    cfg, params = _setup(units=(100,))
    out = fused_drift(
        params, cfg, jnp.asarray(0.5), jnp.ones((8, 2)), interpret=INTERPRET
    )
    assert out.shape == (8, 2)


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
    # jit pins both calls to the unrouted single-solve path (the eager
    # multi-device autoshard route would give per-shard stats instead)
    call = jax.jit(
        lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-4, rtol=1e-4),
        static_argnames=(),
    )
    lp_plain, st_p = call(m_plain, x, k)
    lp_fused, st_f = call(m_fused, x, k)
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
    # jit pins both solves to the unrouted path: eager autoshard routing
    # would use per-shard error norms (tiny shards here), amplifying the
    # tolerance-level fused-vs-plain divergence this test bounds.
    solve = jax.jit(
        lambda mm, bb: mm.sample_ode_from_base(bb, atol=1e-4, rtol=1e-4)
    )
    s_plain, _ = solve(m_plain, base)
    s_fused, _ = solve(m_fused, base)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_plain), atol=1e-4)

    em_plain = m_plain.sample_sde(jax.random.PRNGKey(8), (16, 2), steps=10)
    em_fused = m_fused.sample_sde(jax.random.PRNGKey(8), (16, 2), steps=10)
    np.testing.assert_allclose(
        np.asarray(em_fused.x_mean), np.asarray(em_plain.x_mean), atol=1e-4
    )


def test_fused_em_sampler_matches_scan_with_shared_noise():
    """On non-TPU backends the kernel streams externally drawn noise; feed
    the same noise to a manual scan of the identical update rule and
    require exact agreement (the untrained reverse SDE is chaotic, so
    statistical comparison is meaningless — trajectory equality is the
    right check)."""
    from flowfusion_tpu.kernels import em_sampler as es
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup()
    sde = VPSDE()
    steps, n = 7, 64
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
    noise = jax.random.normal(jax.random.PRNGKey(3), (steps, n, 2))

    coeffs, b_eff = es.em_prep(params, cfg, sde, steps, no_sigma=False)
    E = cfg.embedding_dimensions
    layers = params["layers"]
    w_in = layers[0]["w"][E : E + 2]
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"])
        hidden_flat.append(l["b"][None, :])
    xm_k, x_k, _ = es._fused_em_impl(
        x0, jnp.asarray([0], jnp.int32), noise, None, coeffs, b_eff, w_in,
        tuple(hidden_flat), layers[-1]["w"], layers[-1]["b"][None, :],
        steps=steps, n_hidden=len(layers) - 1, d_out=2, tile=n,
        interpret=True, compute_dtype="float32",
    )

    # manual scan of the same update rule with the same noise
    from flowfusion_tpu.models.nets import apply_score_mlp

    x = x0
    xm = x0
    for s_ in range(steps):
        t = sde.T + s_ * (-(sde.T - sde.epsilon) / steps)
        tb = jnp.full((n,), t)
        net_out = apply_score_mlp(cfg, params, tb, x)
        g2 = sde.diffusion_squared_scalar(jnp.asarray(t))
        c0 = sde.drift_coefficient(jnp.asarray(t))
        c1 = -g2 / sde.sigma(jnp.asarray(t))
        dt = -(sde.T - sde.epsilon) / steps
        xm = (1 + c0 * dt) * x + c1 * dt * net_out
        x = xm + jnp.sqrt(g2) * np.sqrt(abs(dt)) * noise[s_]
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xm_k), np.asarray(xm), rtol=2e-4, atol=1e-4)


def test_fused_em_padding_row_divergence_does_not_freeze_tile():
    """A non-finite trajectory on a tile-PADDING row must not freeze (or
    divergence-flag) the real rows sharing its tile; a non-finite REAL
    row still must.  Streams noise (interpret-mode path) with NaN
    injected into specific rows to force each case deterministically."""
    from flowfusion_tpu.kernels import em_sampler as es
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup()
    sde = VPSDE()
    steps, tile, b_real, b_pad = 5, 64, 96, 128  # tile 1 = 32 real + 32 pad
    x0 = jnp.pad(
        jax.random.normal(jax.random.PRNGKey(1), (b_real, 2)),
        ((0, b_pad - b_real), (0, 0)),
    )
    clean = jax.random.normal(jax.random.PRNGKey(3), (steps, b_pad, 2))

    coeffs, b_eff = es.em_prep(params, cfg, sde, steps, no_sigma=False)
    E = cfg.embedding_dimensions
    layers = params["layers"]
    w_in = layers[0]["w"][E : E + 2]
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"])
        hidden_flat.append(l["b"][None, :])

    def run(noise):
        return es._fused_em_impl(
            x0, jnp.asarray([0], jnp.int32), noise, None, coeffs, b_eff,
            w_in, tuple(hidden_flat), layers[-1]["w"],
            layers[-1]["b"][None, :],
            steps=steps, n_hidden=len(layers) - 1, d_out=2, tile=tile,
            interpret=True, compute_dtype="float32", b_real=b_real,
        )

    xm_clean, x_clean, div_clean = run(clean)
    assert not bool(div_clean)

    # NaN noise on a padding row (row 100, tile 1): real rows unchanged,
    # no freeze, no flag.
    pad_nan = clean.at[0, 100, :].set(jnp.nan)
    xm_p, x_p, div_p = run(pad_nan)
    assert not bool(div_p)
    np.testing.assert_array_equal(
        np.asarray(x_p)[:b_real], np.asarray(x_clean)[:b_real]
    )
    np.testing.assert_array_equal(
        np.asarray(xm_p)[:b_real], np.asarray(xm_clean)[:b_real]
    )

    # NaN noise on a REAL row (row 70, tile 1): the tile freezes and the
    # divergence flag trips — and the freeze keeps outputs finite.
    real_nan = clean.at[0, 70, :].set(jnp.nan)
    xm_r, x_r, div_r = run(real_nan)
    assert bool(div_r)
    assert np.all(np.isfinite(np.asarray(x_r)[:b_real]))
    # tile 0 (rows 0..63) is untouched by tile 1's freeze
    np.testing.assert_array_equal(
        np.asarray(x_r)[:tile], np.asarray(x_clean)[:tile]
    )


def test_fused_em_deterministic_part_matches():
    """With the diffusion zeroed out (pure ODE Euler), the fused kernel and
    the scan path must agree numerically, not just statistically."""
    import dataclasses

    from flowfusion_tpu.kernels.em_sampler import em_prep, fused_em_sample
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.integrate import odeint_fixed
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup(units=(128,))
    sde = VPSDE()

    # Zero the noise by patching coeffs: run the kernel with g*sqrt(dt)=0 by
    # choosing steps such that comparison uses the deterministic drift only.
    # Simplest check: one Euler step of the reverse drift.
    m = ScoreModel(params=params, net=cfg, sde=sde, use_fused_kernel=False)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (64, 2))

    coeffs, b_eff = em_prep(params, cfg, sde, steps=1, no_sigma=False)
    # manual one-step update in plain XLA
    t0 = jnp.asarray(sde.T)
    dt = -(sde.T - sde.epsilon)
    g = sde.diffusion(t0[None], x0)
    drift = sde.drift(t0[None], x0) - g**2 * m.score(jnp.full((64,), sde.T), x0)
    expected_mean = x0 + drift * dt

    growth, c1dt = coeffs[0, 0], coeffs[0, 1]
    from flowfusion_tpu.models.nets import apply_score_mlp

    net_out = apply_score_mlp(cfg, params, jnp.full((64,), sde.T), x0)
    kernel_mean = growth * x0 + c1dt * net_out
    np.testing.assert_allclose(
        np.asarray(kernel_mean), np.asarray(expected_mean), rtol=2e-4, atol=1e-5
    )


@pytest.mark.slow
def test_model_sample_sde_fused_entrypoint():
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg, params = _setup()
    m = ScoreModel(params=params, net=cfg, sde=VESDE(), use_fused_kernel=False)
    res = m.sample_sde_fused(jax.random.PRNGKey(0), (64, 2), steps=10)
    assert res.x_mean.shape == (64, 2)
    assert np.all(np.isfinite(np.asarray(res.x_mean)))


@pytest.mark.slow
def test_fused_velocity_matches_flow_dynamics():
    from flowfusion_tpu.kernels.fused_mlp import fused_velocity
    from flowfusion_tpu.models.flow import ODEFlow

    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, conditional_dimension=2,
        hidden_units=(128, 128),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (48, 2))
    c = jax.random.normal(jax.random.PRNGKey(2), (48, 2))
    t = jnp.asarray(0.42)
    v_ref = flow.dynamics(t, x, c)
    v_fused = fused_velocity(
        flow.params, flow.net, t, x, flow._norm_cond(c), interpret=INTERPRET
    )
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref), atol=2e-5)

    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (48, 2)))
    v_fused2, div = fused_velocity(
        flow.params, flow.net, t, x, flow._norm_cond(c), e=e, interpret=INTERPRET
    )
    v_jvp, je = jax.jvp(lambda q: flow.dynamics(t, q, c), (x,), (e,))
    np.testing.assert_allclose(np.asarray(v_fused2), np.asarray(v_jvp), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(div), np.sum(np.asarray(je) * np.asarray(e), -1),
        rtol=1e-4, atol=2e-4,
    )


def test_fused_velocity_exact_divergence_matches_reference():
    """fused_velocity's basis-tangent exact mode (the TPU path for the
    reference flow module's only divergence option, flow.py:122-166)
    equals the plain exact estimator."""
    from flowfusion_tpu.kernels.fused_mlp import fused_velocity
    from flowfusion_tpu.models.flow import ODEFlow
    from flowfusion_tpu.ops.trace import exact_divergence

    for n_cond in (0, 2):
        flow = ODEFlow.create(
            jax.random.PRNGKey(0), target_dimension=2,
            conditional_dimension=n_cond, hidden_units=(128, 128),
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (48, 2))
        c = (
            jax.random.normal(jax.random.PRNGKey(2), (48, n_cond))
            if n_cond else None
        )
        t = jnp.asarray(0.42)
        v_fused, div_fused = fused_velocity(
            flow.params, flow.net, t, x, flow._norm_cond(c),
            exact_divergence=True, tile=48, interpret=INTERPRET,
        )
        v_ref, div_ref = exact_divergence(lambda q: flow.dynamics(t, q, c), x)
        np.testing.assert_allclose(
            np.asarray(v_fused), np.asarray(v_ref), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(div_fused), np.asarray(div_ref), rtol=1e-4, atol=2e-4
        )


@pytest.mark.slow
def test_flow_fused_exact_logprob_matches_plain():
    """The flow exact-trace solve through the fused basis-tangent kernel
    (forced on TPU, where the plain exact flow graph SIGILLs the platform
    compiler at 50k rows) matches the plain-XLA solve."""
    import dataclasses

    from flowfusion_tpu.models.flow import ODEFlow

    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(128,),
    )
    flow_plain = dataclasses.replace(flow, use_fused_kernel=False)
    flow_fused = dataclasses.replace(flow, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 2))
    call = jax.jit(lambda mm, xx: mm.log_prob(xx, atol=1e-4, rtol=1e-4))
    lp_p, st_p = call(flow_plain, x)
    lp_f, st_f = call(flow_fused, x)
    np.testing.assert_allclose(
        np.asarray(lp_f), np.asarray(lp_p), rtol=1e-4, atol=1e-3
    )
    assert int(st_p.n_accepted) == int(st_f.n_accepted)


@pytest.mark.slow
def test_flow_fused_logprob_matches_plain():
    import dataclasses

    from flowfusion_tpu.models.flow import ODEFlow

    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(128,),
        trace_mode="hutchinson",
    )
    flow_plain = dataclasses.replace(flow, use_fused_kernel=False)
    flow_fused = dataclasses.replace(flow, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 2))
    k = jax.random.PRNGKey(5)
    # jit pins both calls to the unrouted single-solve path (see
    # test_fused_logprob_path_matches_unfused)
    call = jax.jit(lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-4, rtol=1e-4))
    lp_p, st_p = call(flow_plain, x, k)
    lp_f, st_f = call(flow_fused, x, k)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_p), rtol=1e-4, atol=1e-3)
    assert int(st_p.n_accepted) == int(st_f.n_accepted)


def test_fused_exact_divergence_matches_reference():
    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(9), (48, 2))
    t = jnp.asarray(0.6)
    drift, div = fused_drift(
        params, cfg, t, x, exact_divergence=True, c0=-0.2, c1=1.1,
        tile=48, interpret=INTERPRET,
    )
    from flowfusion_tpu.models.nets import apply_score_mlp
    from flowfusion_tpu.ops.trace import exact_divergence

    def net(xx):
        return apply_score_mlp(cfg, params, jnp.full((48,), 0.6), xx)

    out, div_net = exact_divergence(net, x)
    np.testing.assert_allclose(
        np.asarray(drift), -0.2 * np.asarray(x) + 1.1 * np.asarray(out), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(div), -0.2 * 2 + 1.1 * np.asarray(div_net), rtol=1e-4, atol=2e-4
    )


@pytest.mark.slow
def test_fused_exact_logprob_path_matches_unfused():
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup(units=(128,))
    m_plain = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="exact",
        use_fused_kernel=False,
    )
    m_fused = dataclasses.replace(m_plain, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(11), (32, 2))
    # jit pins both calls to the unrouted single-solve path (see
    # test_fused_logprob_path_matches_unfused)
    call = jax.jit(lambda mm, xx: mm.log_prob(xx, atol=1e-4, rtol=1e-4))
    lp_p, st_p = call(m_plain, x)
    lp_f, st_f = call(m_fused, x)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_p), rtol=1e-4, atol=1e-3)
    assert int(st_p.n_accepted) == int(st_f.n_accepted)


def test_fused_em_conditional_matches_scan_with_shared_noise():
    from flowfusion_tpu.kernels import em_sampler as es
    from flowfusion_tpu.models.nets import apply_score_mlp
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup(n_cond=2, units=(128,))
    sde = VPSDE()
    steps, n = 5, 32
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
    cond = jax.random.normal(jax.random.PRNGKey(4), (n, 2))
    noise = jax.random.normal(jax.random.PRNGKey(3), (steps, n, 2))

    coeffs, b_eff = es.em_prep(params, cfg, sde, steps, no_sigma=False)
    E = cfg.embedding_dimensions
    layers = params["layers"]
    w_in = layers[0]["w"][E : E + 2]
    cond_proj = cond @ layers[0]["w"][E + 2 :]
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"])
        hidden_flat.append(l["b"][None, :])
    xm_k, x_k, _ = es._fused_em_impl(
        x0, jnp.asarray([0], jnp.int32), noise, cond_proj, coeffs, b_eff, w_in,
        tuple(hidden_flat), layers[-1]["w"], layers[-1]["b"][None, :],
        steps=steps, n_hidden=len(layers) - 1, d_out=2, tile=n,
        interpret=True, compute_dtype="float32",
    )

    x = x0
    for s_ in range(steps):
        t = sde.T + s_ * (-(sde.T - sde.epsilon) / steps)
        tb = jnp.full((n,), t)
        net_out = apply_score_mlp(cfg, params, tb, x, cond)
        g2 = sde.diffusion_squared_scalar(jnp.asarray(t))
        c0 = sde.drift_coefficient(jnp.asarray(t))
        c1 = -g2 / sde.sigma(jnp.asarray(t))
        dt = -(sde.T - sde.epsilon) / steps
        xm = (1 + c0 * dt) * x + c1 * dt * net_out
        x = xm + jnp.sqrt(g2) * np.sqrt(abs(dt)) * noise[s_]
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x), rtol=2e-4, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="hardware PRNG path needs a real TPU")
def test_fused_em_hardware_rng_produces_finite_normal_noise():
    """Regression: prng_random_bits yields int32; an arithmetic >>8 kept the
    sign bit and made Box-Muller's log(u1) NaN for half of all draws (every
    sample came back NaN on real TPU).  The shift must be logical."""
    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg = ScoreMLPConfig(n_dimensions=2, units=(128, 128))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg, sde=VESDE()
    )
    r = m.sample_sde_fused(jax.random.PRNGKey(1), (4096, 2), steps=50)
    x = np.asarray(r.x_mean)
    assert np.isfinite(x).all()
    # VESDE prior is N(0, sigma_max^2): the 50-step reverse solve from an
    # untrained net keeps an O(sigma_max) spread — catches all-zero or
    # degenerate noise too.
    assert 1.0 < x.std() < 100.0


@pytest.mark.slow
def test_fused_tangents_matches_jvp_reference():
    from flowfusion_tpu.kernels.fused_mlp import fused_drift_tangents
    from flowfusion_tpu.models.nets import apply_score_mlp

    for n_cond in (0, 3):
        cfg, params = _setup(n_cond=n_cond)
        B = 70  # ragged (padding path)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 2))
        cond = (
            jax.random.normal(jax.random.PRNGKey(5), (B, n_cond))
            if n_cond
            else None
        )
        V = jax.random.normal(jax.random.PRNGKey(2), (3, B, 2))
        t = jnp.asarray(0.37)
        c0, c1 = 0.2, -1.7

        def drift_fn(xx):
            tt = jnp.full((xx.shape[0],), t)
            return c0 * xx + c1 * apply_score_mlp(cfg, params, tt, xx, cond)

        drift_cols, jv_cols = fused_drift_tangents(
            params, cfg, t, x, V, cond, c0=c0, c1=c1, tile=64,
            interpret=INTERPRET,
        )
        np.testing.assert_allclose(
            np.asarray(drift_cols.T), np.asarray(drift_fn(x)), atol=2e-5
        )
        for k in range(3):
            _, jv_ref = jax.jvp(drift_fn, (x,), (V[k],))
            np.testing.assert_allclose(
                np.asarray(jv_cols[k].T), np.asarray(jv_ref), atol=2e-5
            )

        # list-of-columns input gives identical results
        _, jv_list = fused_drift_tangents(
            params, cfg, t, x, [V[k].T for k in range(3)], cond,
            c0=c0, c1=c1, tile=64, interpret=INTERPRET,
        )
        for a, b in zip(jv_cols, jv_list):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fused_sketch_single_dispatch_matches_plain_estimators():
    """fused_drift_sketch (one-dispatch Hutch++/XTrace: in-kernel QR +
    sketch algebra + stored-derivative Jacobian reuse) equals the plain
    estimators given identical probes."""
    from flowfusion_tpu.kernels.fused_mlp import fused_drift_sketch
    from flowfusion_tpu.models.nets import apply_score_mlp
    from flowfusion_tpu.ops import trace as trace_lib

    for n_cond in (0, 3):
        cfg, params = _setup(n_cond=n_cond)
        B, D = 70, 2  # ragged (padding path)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
        cond = (
            jax.random.normal(jax.random.PRNGKey(5), (B, n_cond))
            if n_cond
            else None
        )
        t = jnp.asarray(0.37)
        c0, c1 = 0.2, -1.7

        def drift_fn(xx):
            tt = jnp.full((xx.shape[0],), t)
            return c0 * xx + c1 * apply_score_mlp(cfg, params, tt, xx, cond)

        S = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (2, B, D)))
        G = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (1, B, D)))
        drift_k, div_k = fused_drift_sketch(
            params, cfg, t, x, (S, G), "hutchpp", cond, c0=c0, c1=c1,
            tile=64, interpret=INTERPRET,
        )
        drift_p, div_p = trace_lib.hutchpp_divergence(drift_fn, x, S, G)
        np.testing.assert_allclose(np.asarray(drift_k), np.asarray(drift_p),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(div_k), np.asarray(div_p),
                                   atol=2e-4)

        g = jax.random.normal(jax.random.PRNGKey(4), (2, B, D))
        O = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * jnp.sqrt(float(D))
        drift_k, div_k = fused_drift_sketch(
            params, cfg, t, x, (O,), "xtrace", cond, c0=c0, c1=c1,
            tile=64, interpret=INTERPRET,
        )
        drift_p, div_p = trace_lib.xtrace_divergence(drift_fn, x, O)
        np.testing.assert_allclose(np.asarray(drift_k), np.asarray(drift_p),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(div_k), np.asarray(div_p),
                                   atol=2e-4)


@pytest.mark.slow
def test_fused_sketch_logprob_matches_plain():
    """Fused-kernel Hutch++/XTrace solves equal plain XLA within the
    kernel's matmul-precision tolerance (same probes, same algebra)."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    for mode, kw in [
        ("hutchpp", dict(hpp_rank=2, hpp_vecs=1)),
        ("xtrace", dict(xt_vecs=2)),
    ]:
        plain = ScoreModel(
            params=params, net=cfg, sde=VESDE(), trace_mode=mode,
            use_fused_kernel=False, **kw
        )
        fused = dataclasses.replace(plain, use_fused_kernel=True)
        k = jax.random.PRNGKey(7)
        # jit pins both to the unrouted batch-global solve: same probes
        # AND same accept/reject sequence, so the comparison isolates
        # kernel-vs-host numerics (eager multi-device calls now route
        # per shard, where step sequences may legitimately diverge)
        solve = jax.jit(
            lambda mm, xx, kk: mm.solve_odes_forward(xx, key=kk)[1]
        )
        d_plain = solve(plain, x, k)
        d_fused = solve(fused, x, k)
        np.testing.assert_allclose(
            np.asarray(d_fused), np.asarray(d_plain), atol=5e-4
        )


@pytest.mark.slow
def test_flow_fused_sketch_logprob_matches_plain():
    import dataclasses

    from flowfusion_tpu.models.flow import ODEFlow

    model = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(128, 128),
        trace_mode="xtrace", use_fused_kernel=False,
    )
    fused = dataclasses.replace(model, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    k = jax.random.PRNGKey(7)
    lp_plain, _ = model.log_prob(x, key=k)
    lp_fused, _ = fused.log_prob(x, key=k)
    np.testing.assert_allclose(
        np.asarray(lp_fused), np.asarray(lp_plain), atol=5e-4
    )


def test_fused_symplectic_velocity_matches_reference():
    from flowfusion_tpu.kernels.fused_mlp import fused_symplectic_velocity
    from flowfusion_tpu.models.nets import (
        SymplecticMLPConfig,
        apply_symplectic_mlp,
        init_symplectic_mlp,
    )

    for n_cond in (0, 3):
        cfg = SymplecticMLPConfig(n_data_dims=2, n_conditionals=n_cond)
        params = init_symplectic_mlp(jax.random.PRNGKey(0), cfg)
        B = 70
        state = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
        cond = (
            jax.random.normal(jax.random.PRNGKey(2), (B, n_cond))
            if n_cond
            else None
        )
        t = jnp.asarray(0.43)
        out = fused_symplectic_velocity(
            params, cfg, t, state, cond, tile=64, interpret=INTERPRET
        )
        ref = apply_symplectic_mlp(
            cfg, params, jnp.full((B,), t), state, cond
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_symplectic_fused_logprob_matches_plain():
    import dataclasses

    from flowfusion_tpu.models.symplectic import SymplecticFlowModel

    model = SymplecticFlowModel.create(
        jax.random.PRNGKey(0), n_data_dims=2, use_fused_kernel=False
    )
    fused = dataclasses.replace(model, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    k = jax.random.PRNGKey(7)
    lp_plain, _ = model.log_prob(k, x)
    lp_fused, _ = fused.log_prob(k, x)
    np.testing.assert_allclose(
        np.asarray(lp_fused), np.asarray(lp_plain), atol=5e-4
    )
    s_plain = model.sample(k, (128, 2), num_steps=4)
    s_fused = fused.sample(k, (128, 2), num_steps=4)
    np.testing.assert_allclose(
        np.asarray(s_fused), np.asarray(s_plain), atol=5e-4
    )


@pytest.mark.slow
def test_fused_kernel_respects_activation():
    """The kernel must honor cfg.activation (regression: it silently
    applied SiLU for every activation) and refuse unsupported ones."""
    from flowfusion_tpu.kernels.fused_mlp import supports_config

    assert supports_config((128,), "tanh")
    assert supports_config((128,), "relu")
    assert supports_config((128,), "gelu")
    assert not supports_config((128,), "mish")

    for act in ("tanh", "relu", "gelu"):
        cfg, params = _setup()
        cfg = type(cfg)(
            n_dimensions=2, n_conditionals=0, units=(128, 128, 128),
            activation=act,
        )
        params = init_score_mlp(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
        e = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (64, 2)))
        t = jnp.asarray(0.8)
        drift, div = fused_drift(
            params, cfg, t, x, e=e, c0=-0.1, c1=1.3, tile=64,
            interpret=INTERPRET,
        )
        drift_ref, div_ref = fused_drift_reference(
            params, cfg, t, x, e=e, c0=-0.1, c1=1.3
        )
        np.testing.assert_allclose(
            np.asarray(drift), np.asarray(drift_ref), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(div), np.asarray(div_ref), rtol=1e-4, atol=2e-4
        )

    # unsupported activations are now rejected at CONFIG construction
    # (loud at the root cause, before any kernel dispatch)
    with pytest.raises(ValueError, match="activation"):
        ScoreMLPConfig(n_dimensions=2, n_conditionals=0, units=(128,),
                       activation="mish")


@pytest.mark.slow
def test_sample_pc_fused_matches_plain_trajectories():
    """With a shared key the PC sampler's RNG sequence is identical on the
    fused and plain paths, so whole trajectories must agree to kernel
    matmul precision (pins the fused corrector-score branch)."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE

    cfg, params = _setup()
    mf = ScoreModel(
        params=params, net=cfg, sde=VESDE(), use_fused_kernel=True
    )
    mp = dataclasses.replace(mf, use_fused_kernel=False)
    k = jax.random.PRNGKey(1)
    rf = mf.sample_pc(k, (64, 2), steps=6, corrector_steps=2)
    rp = mp.sample_pc(k, (64, 2), steps=6, corrector_steps=2)
    np.testing.assert_allclose(
        np.asarray(rf.x_mean), np.asarray(rp.x_mean), atol=5e-4
    )


def test_highf32_three_pass_mode_near_reference():
    """'highf32' (manual 3-pass bf16 split-dot emulating Precision.HIGH,
    which Mosaic rejects) must sit within ~1e-5 of the f32 reference —
    an order tighter than single-pass bf16 (~1e-3), loose enough to
    catch a regression to either extreme."""
    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (64, 2)))
    t = jnp.asarray(0.4)
    ref_d, ref_v = fused_drift_reference(
        params, cfg, t, x, e=e, c0=-0.3, c1=0.9
    )
    d, v = fused_drift(
        params, cfg, t, x, e=e, c0=-0.3, c1=0.9, tile=64,
        interpret=INTERPRET, compute_dtype="highf32",
    )
    rd = float(jnp.max(jnp.abs(d - ref_d)) / jnp.max(jnp.abs(ref_d)))
    rv = float(jnp.max(jnp.abs(v - ref_v)) / jnp.max(jnp.abs(ref_v)))
    assert rd <= 1e-5, rd
    assert rv <= 1e-5, rv


@pytest.mark.slow
def test_highf32_sketch_modes_near_f32():
    """The single-dispatch Hutch++/XTrace kernels in 'highf32' (3-pass
    split-dot + tanh-sigmoid throughput mode, the benchmark-suite config)
    must track the strict-f32 kernel closely — the in-kernel QR and
    leave-one-out algebra run on split-dot products, so this guards both
    the split arithmetic and the sketch algebra downstream of it."""
    from flowfusion_tpu.kernels.fused_mlp import fused_drift_sketch

    cfg, params = _setup()
    B, D = 70, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    t = jnp.asarray(0.37)
    c0, c1 = 0.2, -1.7
    S = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (2, B, D)))
    G = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (1, B, D)))
    g = jax.random.normal(jax.random.PRNGKey(4), (2, B, D))
    O = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * jnp.sqrt(float(D))
    for mode, probes in (("hutchpp", (S, G)), ("xtrace", (O,))):
        drift32, div32 = fused_drift_sketch(
            params, cfg, t, x, probes, mode, c0=c0, c1=c1, tile=64,
            interpret=INTERPRET,
        )
        drifthf, divhf = fused_drift_sketch(
            params, cfg, t, x, probes, mode, c0=c0, c1=c1, tile=64,
            interpret=INTERPRET, compute_dtype="highf32",
        )
        rd = float(jnp.max(jnp.abs(drifthf - drift32))
                   / jnp.max(jnp.abs(drift32)))
        rv = float(jnp.max(jnp.abs(divhf - div32))
                   / (jnp.max(jnp.abs(div32)) + 1e-12))
        assert rd <= 5e-5, (mode, rd)
        assert rv <= 5e-4, (mode, rv)


def test_highf32_solver_path_runs():
    """ScoreModel plumbed with kernel_compute_dtype='highf32' solves and
    lands near the float32-kernel path."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup(units=(128,))
    m32 = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="hutchinson",
        use_fused_kernel=True,
    )
    mhf = dataclasses.replace(m32, kernel_compute_dtype="highf32")
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 2))
    k = jax.random.PRNGKey(6)
    call = jax.jit(lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-4, rtol=1e-4))
    lp32, _ = call(m32, x, k)
    lphf, _ = call(mhf, x, k)
    np.testing.assert_allclose(
        np.asarray(lphf), np.asarray(lp32), rtol=1e-4, atol=1e-3
    )


def test_highf32_exact_mode_near_f32():
    """The basis-tangent exact mode in 'highf32' (drift and velocity
    kernels) tracks strict f32 — guards the split-dot arithmetic on the
    exact tangent chains, which the hutchinson-mode highf32 test does
    not exercise."""
    from flowfusion_tpu.kernels.fused_mlp import fused_velocity
    from flowfusion_tpu.models.flow import ODEFlow

    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    t = jnp.asarray(0.4)
    d32, v32 = fused_drift(
        params, cfg, t, x, exact_divergence=True, c0=-0.3, c1=0.9,
        tile=64, interpret=INTERPRET,
    )
    dhf, vhf = fused_drift(
        params, cfg, t, x, exact_divergence=True, c0=-0.3, c1=0.9,
        tile=64, interpret=INTERPRET, compute_dtype="highf32",
    )
    assert float(jnp.max(jnp.abs(dhf - d32)) / jnp.max(jnp.abs(d32))) <= 5e-5
    assert float(jnp.max(jnp.abs(vhf - v32))
                 / (jnp.max(jnp.abs(v32)) + 1e-12)) <= 5e-4

    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(128, 128),
    )
    f32 = fused_velocity(
        flow.params, flow.net, t, x, exact_divergence=True, tile=64,
        interpret=INTERPRET,
    )
    fhf = fused_velocity(
        flow.params, flow.net, t, x, exact_divergence=True, tile=64,
        interpret=INTERPRET, compute_dtype="highf32",
    )
    assert float(jnp.max(jnp.abs(fhf[0] - f32[0]))
                 / jnp.max(jnp.abs(f32[0]))) <= 5e-5
    assert float(jnp.max(jnp.abs(fhf[1] - f32[1]))
                 / (jnp.max(jnp.abs(f32[1])) + 1e-12)) <= 5e-4


@pytest.mark.slow
def test_fused_velocity_tangents_matches_jvp_reference():
    """fused_velocity_tangents (the flow twin of fused_drift_tangents:
    velocity + K arbitrary J V probe chains in one dispatch) equals
    jax.jvp on the plain velocity net."""
    from flowfusion_tpu.kernels.fused_mlp import fused_velocity_tangents
    from flowfusion_tpu.models.nets import (
        VelocityMLPConfig,
        apply_velocity_mlp,
        init_velocity_mlp,
    )

    for n_cond in (0, 2):
        cfg = VelocityMLPConfig(
            target_dimension=2,
            conditional_dimension=n_cond,
            hidden_units=(128, 128),
        )
        params = init_velocity_mlp(jax.random.PRNGKey(0), cfg)
        B = 70  # ragged (padding path)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 2))
        cond = (
            jax.random.normal(jax.random.PRNGKey(5), (B, n_cond))
            if n_cond
            else None
        )
        V = jax.random.normal(jax.random.PRNGKey(2), (3, B, 2))
        t = jnp.asarray(0.41)

        def v_fn(xx):
            return apply_velocity_mlp(cfg, params, t, xx, cond)

        v_cols, jv_cols = fused_velocity_tangents(
            params, cfg, t, x, V, cond, tile=64, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(v_cols.T), np.asarray(v_fn(x)), atol=2e-5
        )
        for k in range(3):
            _, jv_ref = jax.jvp(v_fn, (x,), (V[k],))
            np.testing.assert_allclose(
                np.asarray(jv_cols[k].T), np.asarray(jv_ref), atol=2e-5
            )


def test_fused_hutchinson_non_rademacher_probe_matches_plain():
    """The fused Hutchinson c0-term is c0*|e|^2, not c0*D — for Gaussian
    probes the fused and plain estimates must still agree (regression:
    the kernel hard-coded c0*D, ~10x off per sample)."""
    from flowfusion_tpu.ops.trace import hutchinson_divergence

    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    e = jax.random.normal(jax.random.PRNGKey(2), (64, 2))  # NOT Rademacher
    t = jnp.asarray(0.4)
    c0, c1 = -0.8, 0.6

    def drift_fn(xx):
        tt = jnp.full((xx.shape[0],), t)
        from flowfusion_tpu.models.nets import apply_score_mlp

        return c0 * xx + c1 * apply_score_mlp(cfg, params, tt, xx, None)

    drift_f, div_f = fused_drift(
        params, cfg, t, x, e=e, c0=c0, c1=c1, tile=64, interpret=INTERPRET
    )
    _, div_p = hutchinson_divergence(drift_fn, x, e)
    np.testing.assert_allclose(np.asarray(div_f), np.asarray(div_p), atol=2e-4)


def test_fused_hutchinson_conditional_probe_not_padded():
    """Conditional models: the probe projects through only the x-weight
    columns (nrows=d_out) — equivalence with the plain path pins it."""
    from flowfusion_tpu.ops.trace import hutchinson_divergence
    from flowfusion_tpu.models.nets import apply_score_mlp

    cfg, params = _setup(n_cond=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (70, 2))
    cond = jax.random.normal(jax.random.PRNGKey(5), (70, 3))
    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (70, 2)))
    t = jnp.asarray(0.3)

    def drift_fn(xx):
        tt = jnp.full((xx.shape[0],), t)
        return 0.2 * xx - 1.1 * apply_score_mlp(cfg, params, tt, xx, cond)

    drift_f, div_f = fused_drift(
        params, cfg, t, x, cond, e=e, c0=0.2, c1=-1.1, tile=64,
        interpret=INTERPRET,
    )
    drift_p = drift_fn(x)
    _, div_p = hutchinson_divergence(drift_fn, x, e)
    np.testing.assert_allclose(np.asarray(drift_f), np.asarray(drift_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(div_f), np.asarray(div_p), atol=2e-4)


def test_fused_sketch_probe_validation():
    """Empty residual stacks and over-determined sketches raise like the
    host path instead of silently returning NaN / noise estimates."""
    from flowfusion_tpu.kernels.fused_mlp import fused_drift_sketch

    cfg, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    t = jnp.asarray(0.5)
    S = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (1, 16, 2)))
    G0 = jnp.zeros((0, 16, 2))
    with pytest.raises(ValueError, match="residual probe"):
        fused_drift_sketch(params, cfg, t, x, (S, G0), "hutchpp",
                           interpret=INTERPRET)
    O = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 2))  # m=3 > D=2
    with pytest.raises(ValueError, match="xtrace needs"):
        fused_drift_sketch(params, cfg, t, x, (O,), "xtrace",
                           interpret=INTERPRET)


@pytest.mark.slow
def test_sample_dpm_fused_matches_plain():
    """sample_dpm rides the fused kernel when available; outputs must
    match the plain path (same deterministic solve)."""
    import dataclasses
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    for n_cond in (0, 2):
        cfg, params = _setup(n_cond=n_cond, units=(128,))
        m_plain = ScoreModel(
            params=params, net=cfg, sde=VPSDE(), use_fused_kernel=False
        )
        m_fused = dataclasses.replace(m_plain, use_fused_kernel=True)
        base = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
        cond = (
            jax.random.normal(jax.random.PRNGKey(2), (64, n_cond))
            if n_cond else None
        )
        run = jax.jit(
            lambda mm, bb, cc: mm.sample_dpm(bb, conditional=cc, steps=8),
            static_argnums=(),
        )
        out_p = run(m_plain, base, cond)
        out_f = run(m_fused, base, cond)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), rtol=1e-5, atol=1e-4
        )


def test_supports_features_envelope():
    """Feature-count envelope: 64 for forward/Hutchinson/sketch (MXU
    input projection), 16 for exact trace (d_out tangent chains)."""
    from flowfusion_tpu.kernels.fused_mlp import supports_features

    assert supports_features(16, exact=True)
    assert not supports_features(17, exact=True)
    assert supports_features(17)
    assert supports_features(64)
    assert not supports_features(65)


def test_fused_drift_wide_features_matches_jvp():
    """Wide inputs (D + C > 16) ride the kernel's MXU input projection;
    forward drift and Hutchinson divergence must match the plain JVP."""
    from flowfusion_tpu.models.nets import apply_score_mlp

    D, C, B = 20, 8, 48
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=C, units=(128, 128))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, C))
    e = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (B, D)))
    t = jnp.asarray(0.4)
    # tile=None exercises the wide-feature default-tile path end to end
    drift, div = fused_drift(
        params, cfg, t, x, conditional=cond, e=e, c0=-0.2, c1=1.1,
        interpret=INTERPRET,
    )

    def net(xx):
        return apply_score_mlp(cfg, params, jnp.full((B,), 0.4), xx, cond)

    out, je = jax.jvp(net, (x,), (e,))
    np.testing.assert_allclose(
        np.asarray(drift), -0.2 * np.asarray(x) + 1.1 * np.asarray(out),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(div),
        -0.2 * np.sum(np.asarray(e) ** 2, -1)
        + 1.1 * np.sum(np.asarray(je) * np.asarray(e), -1),
        rtol=1e-4, atol=5e-4,
    )


def test_fused_sketch_wide_features_matches_plain():
    """Hutch++/XTrace single-dispatch kernels at D + C > 16 (MXU probe
    projection + the wide-feature IO tile clamp) equal the plain
    estimators with identical probes."""
    from flowfusion_tpu.kernels.fused_mlp import fused_drift_sketch
    from flowfusion_tpu.models.nets import apply_score_mlp
    from flowfusion_tpu.ops import trace as trace_lib

    D, C, B = 24, 4, 40
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=C, units=(128,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, C))
    t = jnp.asarray(0.6)
    c0, c1 = 0.3, -0.9

    def drift_fn(xx):
        tt = jnp.full((xx.shape[0],), t)
        return c0 * xx + c1 * apply_score_mlp(cfg, params, tt, xx, cond)

    S = jnp.sign(jax.random.normal(jax.random.PRNGKey(3), (2, B, D)))
    G = jnp.sign(jax.random.normal(jax.random.PRNGKey(4), (1, B, D)))
    drift_k, div_k = fused_drift_sketch(
        params, cfg, t, x, (S, G), "hutchpp", cond, c0=c0, c1=c1,
        interpret=INTERPRET,
    )
    drift_p, div_p = trace_lib.hutchpp_divergence(drift_fn, x, S, G)
    np.testing.assert_allclose(np.asarray(drift_k), np.asarray(drift_p),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(div_k), np.asarray(div_p),
                               rtol=1e-4, atol=5e-4)

    g = jax.random.normal(jax.random.PRNGKey(5), (2, B, D))
    O = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * jnp.sqrt(float(D))
    drift_k, div_k = fused_drift_sketch(
        params, cfg, t, x, (O,), "xtrace", cond, c0=c0, c1=c1,
        interpret=INTERPRET,
    )
    drift_p, div_p = trace_lib.xtrace_divergence(drift_fn, x, O)
    np.testing.assert_allclose(np.asarray(drift_k), np.asarray(drift_p),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(div_k), np.asarray(div_p),
                               rtol=1e-4, atol=5e-4)


@pytest.mark.slow
def test_wide_feature_model_logprob_fused_matches_plain():
    """Model-level wide envelope: a D=20, C=4 Hutchinson ScoreModel is
    fused-supported (the old bound was D + C <= 16) and its fused solve
    matches plain XLA; exact trace keeps the tight bound."""
    import dataclasses

    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    D, C = 20, 4
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=C, units=(128,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    plain = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="hutchinson",
        use_fused_kernel=False,
    )
    assert plain._fused_supported()
    assert not dataclasses.replace(
        plain, trace_mode="exact"
    )._fused_supported()

    fused = dataclasses.replace(plain, use_fused_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, D))
    cond = jax.random.normal(jax.random.PRNGKey(2), (64, C))
    k = jax.random.PRNGKey(7)
    solve = jax.jit(
        lambda mm, xx, cc, kk: mm.solve_odes_forward(
            xx, conditional=cc, key=kk, atol=1e-4, rtol=1e-4
        )[1]
    )
    d_plain = solve(plain, x, cond, k)
    d_fused = solve(fused, x, cond, k)
    np.testing.assert_allclose(
        np.asarray(d_fused), np.asarray(d_plain), atol=5e-4
    )


def test_fused_em_sampler_wide_features_matches_scan():
    """Wide-D (> 16 features) EM kernel rides the MXU input projection;
    trajectory equality vs a manual scan with shared noise (same check
    as test_fused_em_sampler_matches_scan_with_shared_noise, at D=24)."""
    from flowfusion_tpu.kernels import em_sampler as es
    from flowfusion_tpu.models.nets import apply_score_mlp
    from flowfusion_tpu.ops.sde import VPSDE

    D = 24
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=0, units=(128, 128))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    sde = VPSDE()
    steps, n = 5, 32
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n, D))
    noise = jax.random.normal(jax.random.PRNGKey(3), (steps, n, D))

    coeffs, b_eff = es.em_prep(params, cfg, sde, steps, no_sigma=False)
    E = cfg.embedding_dimensions
    layers = params["layers"]
    w_in = layers[0]["w"][E : E + D]
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"])
        hidden_flat.append(l["b"][None, :])
    xm_k, x_k, _ = es._fused_em_impl(
        x0, jnp.asarray([0], jnp.int32), noise, None, coeffs, b_eff, w_in,
        tuple(hidden_flat), layers[-1]["w"], layers[-1]["b"][None, :],
        steps=steps, n_hidden=len(layers) - 1, d_out=D, tile=n,
        interpret=True, compute_dtype="float32",
    )

    x = x0
    xm = x0
    for s_ in range(steps):
        t = sde.T + s_ * (-(sde.T - sde.epsilon) / steps)
        tb = jnp.full((n,), t)
        net_out = apply_score_mlp(cfg, params, tb, x)
        g2 = sde.diffusion_squared_scalar(jnp.asarray(t))
        c0 = sde.drift_coefficient(jnp.asarray(t))
        c1 = -g2 / sde.sigma(jnp.asarray(t))
        dt = -(sde.T - sde.epsilon) / steps
        xm = (1 + c0 * dt) * x + c1 * dt * net_out
        x = xm + jnp.sqrt(g2) * np.sqrt(abs(dt)) * noise[s_]
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(xm_k), np.asarray(xm), rtol=2e-4, atol=2e-4)


def test_fused_em_divergence_flag():
    """The EM kernel's NaN-freeze keeps the returned samples finite, so
    divergence must surface through the per-tile flag: a solve started
    from an astronomically large state overflows the net at step 0,
    freezes, and must report diverged=True (previously the finite frozen
    outputs made nan_encountered silently False); a normal solve from
    prior samples must stay diverged=False."""
    from flowfusion_tpu.kernels.em_sampler import fused_em_sample
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VPSDE

    cfg, params = _setup(units=(128,))
    sde = VPSDE()

    x_big = jnp.full((64, 2), 1e38, jnp.float32)
    xm, x, diverged = fused_em_sample(params, cfg, sde, x_big, 0, steps=5)
    assert bool(diverged)
    # frozen at the last finite state (the initial state): finite outputs
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_big))

    x0 = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    _, _, clean = fused_em_sample(params, cfg, sde, x0, 0, steps=5)
    assert not bool(clean)

    # model-level: nan_encountered must carry the kernel flag
    m = ScoreModel(params=params, net=cfg, sde=sde)
    res = m.sample_sde_fused(jax.random.PRNGKey(0), (64, 2), steps=5)
    assert not bool(res.nan_encountered)


def test_io_clamp_applies_to_wrapper_tiles():
    """Every fused entry point's tile (mode default, wrapper-tuned, or
    explicit) passes through the IO-block VMEM clamp, so wide-feature
    configs admitted by supports_features cannot exceed the ~8 MiB
    per-grid-step IO budget (a D=64 Hutchinson dispatch at fused_drift's
    2048 default would otherwise keep ~12.6 MiB live)."""
    from flowfusion_tpu.kernels.fused_mlp import _io_clamped_tile

    budget = 8 * 2**20
    # fused_drift hutchinson, D=64 unconditional: heavy = 64 + 65 + 64
    assert _io_clamped_tile(2048, 8, 193) * 8 * 193 * 4 <= budget
    # fused_drift_sketch hutchpp, D=64, r=m=4: heavy = 64 + 8*64+1 + 64
    assert _io_clamped_tile(1024, 8, 641) * 8 * 641 * 4 <= budget
    # narrow legacy configs are untouched by the clamp at their defaults
    assert _io_clamped_tile(4096, 16, 2 + 0 + 2) == 4096
    assert _io_clamped_tile(3072, 8, 2 + 3 + 2) == 3072
    # floor: never clamps below 256
    assert _io_clamped_tile(256, 8, 10**6) == 256


def test_wide_hutchinson_default_tile_dispatch():
    """End-to-end: a D=64 Hutchinson fused_drift with the DEFAULT tile
    (the config the unclamped wrapper default would VMEM-OOM on real
    hardware) dispatches and matches the plain-XLA JVP reference."""
    from flowfusion_tpu.kernels.fused_mlp import (
        fused_drift,
        fused_drift_reference,
    )

    D = 64
    cfg = ScoreMLPConfig(n_dimensions=D, n_conditionals=0, units=(128,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (512, D))
    e = jax.random.rademacher(jax.random.PRNGKey(2), (512, D), jnp.float32)
    t = jnp.asarray(0.7)
    dr_k, div_k = fused_drift(params, cfg, t, x, e=e, c0=0.3, c1=-1.7)
    dr_p, div_p = fused_drift_reference(params, cfg, t, x, e=e, c0=0.3, c1=-1.7)
    np.testing.assert_allclose(np.asarray(dr_k), np.asarray(dr_p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(div_k), np.asarray(div_p), rtol=1e-4, atol=5e-4)


def test_wide_net_fused_drift_matches_plain_interpret():
    """Width-384 nets ride the same kernel (the VMEM width-clamp shrinks
    the batch tile instead of letting Mosaic OOM at compile — capacity
    sweep, 2026-08-20); numerics must still match plain XLA."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowfusion_tpu.kernels.fused_mlp import fused_drift
    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops import trace as trace_lib
    from flowfusion_tpu.ops.sde import VESDE

    cfg = ScoreMLPConfig(n_dimensions=2, units=(384, 384, 384))
    model = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg,
        sde=VESDE(), trace_mode="hutchinson",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 2))
    e = trace_lib.make_probes("hutchinson", jax.random.PRNGKey(2), x)[0]
    c0, c1 = model._fused_coeffs(0.5)

    drift_f, div_f = fused_drift(
        model.params, cfg, jnp.asarray(0.5), x, e=e, c0=c0, c1=c1,
        interpret=True,
    )
    m_plain = dataclasses.replace(model, use_fused_kernel=False)
    drift_p, div_p = trace_lib.hutchinson_divergence(
        lambda xx: m_plain.ode_drift(0.5, xx), x, e
    )
    np.testing.assert_allclose(
        np.asarray(drift_f), np.asarray(drift_p), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(div_f), np.asarray(div_p), rtol=2e-4, atol=2e-4
    )


def test_wide_flow_fused_velocity_matches_dynamics_interpret():
    """The width clamp covers the flow family's fused_velocity too (same
    _dispatch); width-384 velocity + exact divergence must match the
    plain dynamics in interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowfusion_tpu.kernels.fused_mlp import fused_velocity
    from flowfusion_tpu.models.flow import ODEFlow

    flow = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(384, 384),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 2))
    v_f, div_f = fused_velocity(
        flow.params, flow.net, jnp.asarray(0.3), x, exact_divergence=True,
        interpret=True,
    )
    v_p = flow.dynamics(0.3, x)
    np.testing.assert_allclose(
        np.asarray(v_f), np.asarray(v_p), rtol=2e-5, atol=2e-5
    )
    assert np.all(np.isfinite(np.asarray(div_f)))


def test_vmem_width_clamp_raises_when_nothing_fits():
    """ADVICE r3: chains*H > 12288 used to floor the tile at 256 and emit
    a plan Mosaic refuses to compile; now it raises with advice."""
    from flowfusion_tpu.kernels.fused_mlp import vmem_width_clamp

    # inside the budget: shrink-only clamping still works
    assert vmem_width_clamp(4096, 128, 4) <= 4096
    assert vmem_width_clamp(256, 384, 4) == 256
    # exact trace d_out=16 (17 chains) at H=896: over budget at any tile
    with pytest.raises(ValueError, match="hutchinson"):
        vmem_width_clamp(256, 896, 17)
