"""Multi-device tests on the 8-device CPU mesh (conftest forces it)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops.sde import VPSDE
from flowfusion_tpu.parallel.sharding import (
    data_parallel,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh"
)


def _model(trace_mode="exact"):
    cfg = ScoreMLPConfig(n_dimensions=2, units=(32,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    return ScoreModel(params=params, net=cfg, sde=VPSDE(), trace_mode=trace_mode)


def test_mesh_and_batch_sharding():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    x = jnp.ones((64, 2))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")


@pytest.mark.slow
def test_sharded_logprob_matches_single_device():
    """Batch-global adaptive stepping must be invariant to sharding: the
    error-norm reductions psum over the mesh, so the step sequence — and
    therefore the densities — are identical."""
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    lp_single, _ = jax.jit(lambda mm, xx: mm.log_prob(xx))(m, x)

    mesh = make_mesh()
    fn = data_parallel(lambda xx: m.log_prob(xx)[0], mesh)
    lp_sharded = fn(x)
    # cross-device psum reduction order perturbs the error norm at f32
    # round-off, which can shift a step boundary: allow tiny slack.
    np.testing.assert_allclose(
        np.asarray(lp_single), np.asarray(lp_sharded), atol=5e-4
    )


def test_sharded_train_step_matches_single_device():
    import optax

    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 2))
    key = jax.random.PRNGKey(3)
    tx = optax.adam(1e-3)

    def step(model, x):
        loss, grads = jax.value_and_grad(lambda mm: mm.loss_fn(key, x))(model)
        return loss, grads

    loss_single, grads_single = jax.jit(step)(m, x)

    mesh = make_mesh()
    m_rep = replicate(m, mesh)
    xs = shard_batch(x, mesh)
    loss_shard, grads_shard = jax.jit(step)(m_rep, xs)
    np.testing.assert_allclose(float(loss_single), float(loss_shard), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_single),
        jax.tree_util.tree_leaves(grads_shard),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_em_sampler_sharded_runs():
    m = _model()
    mesh = make_mesh()
    with mesh:
        res = jax.jit(
            lambda mm, k: mm.sample_sde(k, (64, 2), steps=10),
        )(replicate(m, mesh), jax.random.PRNGKey(0))
    assert res.x_mean.shape == (64, 2)
    assert np.all(np.isfinite(np.asarray(res.x_mean)))


def test_pad_to_multiple():
    x = jnp.ones((13, 2))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 2) and n == 13


def test_tensor_parallel_hidden_sharding_compiles():
    """Hidden-dim (tensor-parallel) sharding of the MLP compiles + runs."""
    mesh = make_mesh(model_axis=2)
    m = _model()

    def spec(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", "")))) for p in path]
        if "W" in keys:
            return NamedSharding(mesh, P())
        if keys and keys[-1] == "w":
            idx = next(p.idx for p in path if hasattr(p, "idx"))
            if idx == 0:
                return NamedSharding(mesh, P(None, "model"))
            return NamedSharding(mesh, P("model", None))
        if keys and keys[-1] == "b":
            idx = next(p.idx for p in path if hasattr(p, "idx"))
            if idx == 0:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map_with_path(spec, m.params)
    params = jax.device_put(m.params, shardings)
    m_tp = dataclasses.replace(m, params=params)
    x = shard_batch(jnp.ones((16, 2)), mesh)
    t = jnp.full((16,), 0.5)
    out = jax.jit(lambda mm, tt, xx: mm.score(tt, xx))(m_tp, t, x)
    assert out.shape == (16, 2)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_per_shard_data_parallel_with_fused_kernel():
    """data_parallel_per_shard: each shard solves independently under
    shard_map, with the fused Pallas RHS forced on (interpret off-TPU) —
    the pod-slice deployment path for the kernels.  Values must agree
    with the batch-global single-jit solve to solver accuracy."""
    from flowfusion_tpu.parallel.sharding import data_parallel_per_shard

    cfg = ScoreMLPConfig(n_dimensions=2, units=(128,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    # exact trace: deterministic, so per-shard and global solves are
    # directly comparable (hutchinson probes are drawn per solve, so a
    # per-shard solve sees different probes per row — estimator variance,
    # not solver error, would dominate the comparison).
    m = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="exact",
        use_fused_kernel=True,
    )
    mesh = make_mesh()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    key = jax.random.PRNGKey(2)

    lp_sharded = data_parallel_per_shard(
        lambda xx: m.log_prob(xx, key=key, atol=1e-6, rtol=1e-6)[0], mesh
    )(x)
    assert lp_sharded.sharding.spec == P("data")

    lp_global, _ = jax.jit(
        lambda xx: m.log_prob(xx, key=key, atol=1e-6, rtol=1e-6)
    )(x)
    np.testing.assert_allclose(
        np.asarray(lp_sharded), np.asarray(lp_global), atol=5e-4
    )


def test_initialize_distributed_single_process_noop():
    from flowfusion_tpu.parallel import initialize_distributed

    # No coordinator configured: must be a harmless no-op returning 0.
    assert initialize_distributed() == 0


def test_global_batch_from_local_single_process():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flowfusion_tpu.parallel import (
        data_parallel,
        global_batch_from_local,
        local_rows,
        make_mesh,
    )

    mesh = make_mesh()
    x_local = np.arange(32, dtype=np.float32).reshape(16, 2)
    xg = global_batch_from_local(x_local, mesh)
    assert xg.shape == (16, 2)  # process_count == 1
    np.testing.assert_array_equal(np.asarray(xg), x_local)
    start, stop = local_rows(16)
    assert (start, stop) == (0, 16)

    # The assembled global array must be usable by the sharded entry points.
    out = data_parallel(lambda b: jnp.sum(b, axis=-1), mesh)(xg)
    np.testing.assert_allclose(np.asarray(out), x_local.sum(-1))


def test_local_rows_single_process_full_range():
    from flowfusion_tpu.parallel import local_rows

    # One process owns the whole batch; divisibility is checked against
    # the DEVICE count (what the downstream 'data' sharding requires).
    n_dev = jax.device_count()
    assert local_rows(2 * n_dev) == (0, 2 * n_dev)
    with pytest.raises(ValueError, match="devices"):
        local_rows(2 * n_dev + 1)


@pytest.mark.slow
def test_per_shard_sketch_estimators_fused():
    """Sketch estimators under data_parallel_per_shard with the fused
    multi-tangent kernel forced on.  Full-rank Hutch++ (r = D) equals the
    exact trace regardless of the probe draw, so per-shard solves (which
    see different probes per row) remain directly comparable to the
    unsharded solve; XTrace gets a finiteness/closeness smoke check."""
    from flowfusion_tpu.parallel.sharding import data_parallel_per_shard

    cfg = ScoreMLPConfig(n_dimensions=2, units=(128,))
    params = init_score_mlp(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    key = jax.random.PRNGKey(2)

    m_exact = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="exact",
        use_fused_kernel=True,
    )
    lp_exact, _ = jax.jit(
        lambda xx: m_exact.log_prob(xx, key=key, atol=1e-6, rtol=1e-6)
    )(x)

    m_hpp = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="hutchpp",
        hpp_rank=2, hpp_vecs=1, use_fused_kernel=True,
    )
    lp_hpp = data_parallel_per_shard(
        lambda xx: m_hpp.log_prob(xx, key=key, atol=1e-6, rtol=1e-6)[0], mesh
    )(x)
    np.testing.assert_allclose(
        np.asarray(lp_hpp), np.asarray(lp_exact), atol=5e-4
    )

    m_xt = ScoreModel(
        params=params, net=cfg, sde=VPSDE(), trace_mode="xtrace",
        xt_vecs=2, use_fused_kernel=True,
    )
    lp_xt = data_parallel_per_shard(
        lambda xx: m_xt.log_prob(xx, key=key, atol=1e-6, rtol=1e-6)[0], mesh
    )(x)
    assert np.all(np.isfinite(np.asarray(lp_xt)))
    # XTrace on an untrained (strongly nonlinear) field has per-point
    # estimator variance of O(nats); the unbiased summed density is the
    # meaningful statistic (same check the reference notebooks use).
    s_xt, s_ex = float(np.sum(lp_xt)), float(np.sum(lp_exact))
    assert abs(s_xt - s_ex) / abs(s_ex) < 0.2


def test_scalar_leaves_and_validation():
    """Rank-0 leaves replicate instead of crashing the wrappers; ragged
    batches and bad model_axis raise actionable errors."""
    from flowfusion_tpu.parallel.sharding import (
        data_parallel,
        data_parallel_per_shard,
        make_mesh,
        replicate,
        shard_batch,
    )

    mesh = make_mesh()
    n_dev = len(jax.devices())

    def fn(batch):
        return batch["x"] * batch["gain"]

    batch = {"x": jnp.ones((n_dev * 4, 2)), "gain": jnp.float32(3.0)}
    out = data_parallel(fn, mesh)(batch)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    out2 = data_parallel_per_shard(fn, mesh)(batch)
    np.testing.assert_allclose(np.asarray(out2), 3.0)

    # ragged batch: actionable error naming pad_to_multiple
    with pytest.raises(ValueError, match="pad_to_multiple"):
        shard_batch(jnp.ones((n_dev * 4 + 1, 2)), mesh)
    # model_axis validation
    with pytest.raises(ValueError, match="model_axis"):
        make_mesh(model_axis=0)
    # per-shard wrapper rejects redundant model axes
    if n_dev % 2 == 0 and n_dev >= 2:
        mesh2 = make_mesh(model_axis=2)
        with pytest.raises(ValueError, match="redundantly"):
            data_parallel_per_shard(fn, mesh2)
    # replicate passes non-array leaves through
    rep = replicate({"w": jnp.ones(3), "name": "adam"}, mesh)
    assert rep["name"] == "adam"
