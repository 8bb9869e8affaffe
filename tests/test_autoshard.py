"""Automatic multi-device routing (parallel.autoshard).

Round-1 VERDICT "What's weak" #4: on a multi-device realm the default
``model.log_prob(x)`` raised (exact trace) or risked the compiler-crashing
plain graph.  These tests pin the fix on the 8-device CPU mesh (conftest):
eager calls route per-shard transparently, user jits are left alone, and
routed results agree with direct solves to solver tolerance.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops.sde import VESDE


N_DEV = len(jax.devices())
pytestmark = pytest.mark.skipif(N_DEV < 2, reason="needs a multi-device mesh")


@pytest.fixture(scope="module")
def score_model():
    cfg = ScoreMLPConfig(n_dimensions=2, units=(128, 128))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    return ScoreModel(
        params=params, net=cfg, sde=VESDE(), trace_mode="hutchinson"
    )


def test_logprob_routes_and_is_finite(score_model):
    x = jax.random.normal(jax.random.PRNGKey(1), (103, 2))  # ragged batch
    lp, stats = score_model.log_prob(x, key=jax.random.PRNGKey(2))
    assert lp.shape == (103,)
    # one independent solve per device
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_exact_trace_routes(score_model):
    """Round 1: this exact call pattern raised on multi-device TPU."""
    m = dataclasses.replace(score_model, trace_mode="exact")
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    lp, stats = m.log_prob(x)
    assert lp.shape == (64,)
    assert bool(jnp.all(jnp.isfinite(lp)))


@pytest.mark.slow
def test_routed_matches_direct_within_tolerance(score_model):
    """Per-shard stepping deviates from batch-global stepping by
    O(tolerance); tightening the tolerance must shrink the gap."""
    m = dataclasses.replace(score_model, trace_mode="exact")
    x = jax.random.normal(jax.random.PRNGKey(3), (N_DEV * 8, 2))
    diffs = {}
    for tol in (1e-3, 1e-6):
        lp_routed, _ = m.log_prob(x, atol=tol, rtol=tol)
        # direct single-solve path: go through a jit (tracers disable
        # routing), which also pins the "user jit is left alone" contract
        lp_direct = jax.jit(
            lambda mm, xx: mm.log_prob(xx, atol=tol, rtol=tol)[0]
        )(m, x)
        diffs[tol] = float(jnp.abs(lp_routed - lp_direct).max())
    assert diffs[1e-6] < 1e-4
    assert diffs[1e-6] <= diffs[1e-3] + 1e-7


def test_jit_path_not_routed(score_model):
    """Inside a user jit, inputs are tracers: routing must stay out."""
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    lp, stats = jax.jit(
        lambda mm, xx, k: mm.log_prob(xx, key=k)
    )(score_model, x, jax.random.PRNGKey(2))
    # unrouted stats are scalar counters, not per-device arrays
    assert stats.n_func_evals.shape == ()
    assert lp.shape == (16,)


def test_conditional_logprob_routes():
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=3, units=(128, 128))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    m = ScoreModel(params=params, net=cfg, sde=VESDE(), trace_mode="hutchinson")
    x = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
    c = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
    lp, _ = m.log_prob(x, c, key=jax.random.PRNGKey(3))
    assert lp.shape == (50,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_sample_sde_routes(score_model):
    res = score_model.sample_sde(jax.random.PRNGKey(4), (37, 2), steps=10)
    assert res.x_mean.shape == (37, 2)
    assert res.x.shape == (37, 2)
    assert res.nan_encountered.shape == ()  # API shape preserved
    assert bool(jnp.all(jnp.isfinite(res.x_mean)))
    # shards draw different keys: rows must not repeat across shards.
    # shard size is ceil(37 / N_DEV) (the batch is padded up), so the
    # windows [0:per) and [per:2*per) are exactly shards 0 and 1.
    per = -(-37 // N_DEV)
    if N_DEV >= 2 and 2 * per <= 37:
        assert not np.allclose(
            np.asarray(res.x_mean[:per]), np.asarray(res.x_mean[per : 2 * per])
        )


def test_sample_ode_from_base_routes(score_model):
    z = jax.random.normal(jax.random.PRNGKey(5), (41, 2))
    samples, stats = score_model.sample_ode_from_base(z, atol=1e-3, rtol=1e-3)
    assert samples.shape == (41, 2)
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(samples)))


def test_flow_logprob_and_sample_route():
    flow = ODEFlow.create(jax.random.PRNGKey(0), target_dimension=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (43, 2))
    lp, stats = flow.log_prob(x)
    assert lp.shape == (43,)
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(lp)))

    z = jax.random.normal(jax.random.PRNGKey(2), (19, 2))
    x0, stats = flow.sample(z, atol=1e-4, rtol=1e-4)
    assert x0.shape == (19, 2)
    assert bool(jnp.all(jnp.isfinite(x0)))


def test_param_update_reuses_cache(score_model):
    """The model rides as an argument: a param update must not grow the
    lru cache (no recompilation keyed on weights)."""
    from flowfusion_tpu.parallel import autoshard

    x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    score_model.log_prob(x, key=jax.random.PRNGKey(2))
    info0 = autoshard._cached_sharded_fn.cache_info()
    bumped = dataclasses.replace(
        score_model,
        params=jax.tree_util.tree_map(lambda a: a + 1e-4, score_model.params),
    )
    bumped.log_prob(x, key=jax.random.PRNGKey(3))
    info1 = autoshard._cached_sharded_fn.cache_info()
    assert info1.misses == info0.misses
    assert info1.hits > info0.hits


def test_unhashable_options_fall_back_to_unrouted(score_model):
    """Solver options with jax-scalar values must not crash the routing
    layer's lru cache — scalars are coerced, non-scalars skip routing."""
    x = jax.random.normal(jax.random.PRNGKey(7), (32, 2))
    # 0-d jax scalar: coerced to a Python float, still routed
    lp, stats = score_model.log_prob(
        x, key=jax.random.PRNGKey(8), options={"min_step": jnp.float32(1e-6)}
    )
    assert lp.shape == (32,)
    assert stats.n_func_evals.shape == (N_DEV,)
    # non-scalar option value: unroutable, falls back to the single solve,
    # which then rejects the unknown key with the solver's own clear error
    # (NOT an lru-cache 'unhashable type' TypeError from the routing layer)
    with pytest.raises(ValueError, match="unknown solver options"):
        score_model.log_prob(
            x, key=jax.random.PRNGKey(8), options={"step_grid": jnp.ones((3,))}
        )


def test_population_wrapper_logprob_routes(score_model):
    """The wrapper's production log_prob path routes too (round-2 review:
    it bypassed ScoreModel.log_prob and so missed autoshard)."""
    from flowfusion_tpu.models.population import PopulationModelDiffusion

    m = PopulationModelDiffusion(
        score_model=dataclasses.replace(score_model, trace_mode="exact"),
        shift=jnp.asarray([1.0, -1.0]),
        scale=jnp.asarray([2.0, 0.5]),
        conditional_shift=None,
        conditional_scale=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (37, 2))
    lp, stats = m.log_prob(x)
    assert lp.shape == (37,)
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(lp)))

    # routed and unrouted (jit-pinned) agree to solver tolerance
    lp_direct, _ = jax.jit(lambda mm, xx: mm.log_prob(xx))(m, x)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lp_direct), atol=5e-3
    )


def test_symplectic_logprob_routes():
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel

    m = SymplecticFlowModel.create(jax.random.PRNGKey(0), n_data_dims=2, units=(128,))
    x = jax.random.normal(jax.random.PRNGKey(1), (29, 2))
    lp, stats = m.log_prob(jax.random.PRNGKey(2), x, n_momentum_samples=2)
    assert lp.shape == (29,)
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(lp)))


@pytest.mark.slow
def test_log_prob_per_sample_routes_all_families(score_model):
    """Eager per-sample calls shard the batch too; stats stay (B,)-shaped
    (per row, not per shard) and values match the jit-pinned unrouted
    path at per-sample-mode tolerances."""
    x = jax.random.normal(jax.random.PRNGKey(3), (37, 2))  # ragged batch
    key = jax.random.PRNGKey(4)

    lp, stats = score_model.log_prob_per_sample(x, key=key, atol=1e-5, rtol=1e-5)
    assert lp.shape == (37,) and stats.n_func_evals.shape == (37,)
    assert bool(jnp.all(jnp.isfinite(lp))) and bool(jnp.all(stats.succeeded))
    # the routed path folds the key per shard, so compare against an
    # exact-trace run where the probe draw is irrelevant
    m_exact = dataclasses.replace(score_model, trace_mode="exact")
    lp_r, _ = m_exact.log_prob_per_sample(x, atol=1e-6, rtol=1e-6)
    lp_u, _ = jax.jit(
        lambda mm, xx: mm.log_prob_per_sample(xx, atol=1e-6, rtol=1e-6)
    )(m_exact, x)
    np.testing.assert_allclose(np.asarray(lp_r), np.asarray(lp_u), atol=1e-4)

    flow = ODEFlow.create(
        jax.random.PRNGKey(5), target_dimension=2, hidden_units=(32,),
        trace_mode="exact",
    )
    lp_f, stats_f = flow.log_prob_per_sample(x, atol=1e-5, rtol=1e-5)
    assert lp_f.shape == (37,) and stats_f.n_func_evals.shape == (37,)
    assert bool(jnp.all(jnp.isfinite(lp_f)))

    from flowfusion_tpu.models.symplectic import SymplecticFlowModel

    sym = SymplecticFlowModel.create(jax.random.PRNGKey(6), n_data_dims=2, units=(32,))
    lp_s, stats_s = sym.log_prob_per_sample(key, x, atol=1e-5, rtol=1e-5)
    assert lp_s.shape == (37,) and stats_s.n_func_evals.shape == (37,)
    assert bool(jnp.all(jnp.isfinite(lp_s)))


def test_symplectic_sample_routes():
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel

    sym = SymplecticFlowModel.create(jax.random.PRNGKey(0), n_data_dims=2, units=(32,))
    q = sym.sample(jax.random.PRNGKey(1), (37, 2), num_steps=2)
    assert q.shape == (37, 2)
    assert bool(jnp.all(jnp.isfinite(q)))
    # shards draw different keys: rows must not repeat across shards
    # (windows aligned to the padded shard size ceil(37 / N_DEV))
    per = -(-37 // N_DEV)
    if N_DEV >= 2 and 2 * per <= 37:
        assert not np.allclose(np.asarray(q[:per]), np.asarray(q[per : 2 * per]))
    # leapfrog routes too
    q2 = sym.sample(jax.random.PRNGKey(2), (19, 2), num_steps=2, method="leapfrog")
    assert q2.shape == (19, 2) and bool(jnp.all(jnp.isfinite(q2)))


def test_routing_respects_param_only_jit(score_model):
    """A user jit that traces only the MODEL (data as closure constants)
    must not be routed — routing would nest shard_map inside the user's
    jit and override their sharding (regression: should_route only
    checked the data arguments)."""
    import flowfusion_tpu.parallel.autoshard as autoshard

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    key = jax.random.PRNGKey(2)

    calls = {"n": 0}
    orig = autoshard.routed_call

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    autoshard.routed_call = spy
    try:
        lp = jax.jit(
            lambda m: m.log_prob(x, key=key, atol=1e-3, rtol=1e-3)[0]
        )(score_model)
        assert bool(jnp.all(jnp.isfinite(lp)))
        assert calls["n"] == 0, "routed inside a param-only user jit"
    finally:
        autoshard.routed_call = orig


def test_solve_odes_forward_routes(score_model):
    """The reference-public solve_odes_forward routes on multi-device
    realms like log_prob (it used to raise for exact-trace there)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 2))
    xT, dlp, stats = score_model.solve_odes_forward(
        x, key=jax.random.PRNGKey(2), atol=1e-3, rtol=1e-3
    )
    assert xT.shape == (37, 2) and dlp.shape == (37,)
    assert stats.n_func_evals.shape == (N_DEV,)
    assert bool(jnp.all(jnp.isfinite(dlp)))


def test_sample_dpm_routes(score_model):
    base = jax.random.normal(jax.random.PRNGKey(11), (37, 2))
    out = score_model.sample_dpm(base, steps=6)
    assert out.shape == (37, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_traced_option_value_is_unroutable_not_crash():
    """A 0-d TRACED option value must make hashable_options return
    UNROUTABLE — .item() on a tracer raised ConcretizationTypeError from
    the routing layer before (a multi-device-only crash masking the
    solver's own clear static-options error)."""
    from flowfusion_tpu.parallel import autoshard

    sentinel = {}

    def probe(s):
        sentinel["result"] = autoshard.hashable_options({"min_step": s})
        return s

    jax.jit(probe)(jnp.float32(1e-6))
    assert sentinel["result"] is autoshard.UNROUTABLE
    # concrete scalars still coerce and route
    out = autoshard.hashable_options({"min_step": jnp.float32(1e-6)})
    assert out == (("min_step", 9.999999974752427e-07),) or out[0][0] == "min_step"
