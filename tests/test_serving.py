"""AOT serving artifacts (utils/serving.py): export -> serialize ->
deserialize -> call must agree with the live model, for all three
families, with and without conditionals, symbolic and fixed batch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.population import PopulationModelDiffusion
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.models.symplectic import SymplecticFlowModel
from flowfusion_tpu.ops.sde import VESDE, VPSDE
from flowfusion_tpu.utils import serving


def _score_model(trace_mode="hutchinson"):
    cfg = ScoreMLPConfig(n_dimensions=2, units=(32,))
    return ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg),
        net=cfg,
        sde=VESDE(),
        trace_mode=trace_mode,
    )


def test_score_model_roundtrip_symbolic_batch():
    m = _score_model()
    blob = serving.export_log_prob(m, atol=1e-4, rtol=1e-4)
    f = serving.deserialize_log_prob(blob)
    for batch in (16, 48):
        x = jax.random.normal(jax.random.PRNGKey(batch), (batch, 2))
        lp = f(x, seed=7)
        lp_ref = jax.jit(
            lambda mm, xx, kk: mm.log_prob(
                xx, key=kk, atol=1e-4, rtol=1e-4
            )[0]
        )(m, x, jax.random.PRNGKey(7))
        assert lp.shape == (batch,)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref), atol=1e-5)


@pytest.mark.slow
def test_population_wrapper_conditional_fixed_batch(tmp_path):
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(1),
        VPSDE(),
        n_dimensions=2,
        n_conditionals=3,
        units=(32,),
        trace_mode="hutchinson",
    )
    blob = serving.export_log_prob(m, batch=8, atol=1e-3, rtol=1e-3)

    # file roundtrip
    path = str(tmp_path / "pop.flax_export")
    serving.save_artifact(path, blob)
    f = serving.deserialize_log_prob(serving.load_artifact(path))

    x = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    c = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    lp = f(x, c, seed=11)
    lp_ref = jax.jit(
        lambda mm, xx, cc, kk: mm.log_prob(
            xx, conditional=cc, key=kk, atol=1e-3, rtol=1e-3
        )[0]
    )(m, x, c, jax.random.PRNGKey(11))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref), atol=1e-5)

    # fixed batch: wrong batch size must be rejected by the artifact
    with pytest.raises(Exception):
        f(jax.random.normal(jax.random.PRNGKey(4), (4, 2)),
          jax.random.normal(jax.random.PRNGKey(5), (4, 3)), seed=11)


@pytest.mark.slow
def test_flow_and_symplectic_roundtrip():
    flow = ODEFlow.create(
        jax.random.PRNGKey(4), target_dimension=2, hidden_units=(32,),
        trace_mode="hutchinson",
    )
    f = serving.deserialize_log_prob(
        serving.export_log_prob(flow, atol=1e-4, rtol=1e-4)
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (24, 2))
    lp_ref = jax.jit(
        lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-4, rtol=1e-4)[0]
    )(flow, x, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(f(x, seed=3)), np.asarray(lp_ref), atol=1e-5
    )

    sym = SymplecticFlowModel.create(
        jax.random.PRNGKey(6), n_data_dims=2, units=(32,)
    )
    g = serving.deserialize_log_prob(
        serving.export_log_prob(sym, atol=1e-4, rtol=1e-4)
    )
    lp_ref = jax.jit(
        lambda mm, kk, xx: mm.log_prob(kk, xx, atol=1e-4, rtol=1e-4)[0]
    )(sym, jax.random.PRNGKey(9), x)
    np.testing.assert_allclose(
        np.asarray(g(x, seed=9)), np.asarray(lp_ref), atol=1e-5
    )


@pytest.mark.slow
def test_seed_changes_probe_draw():
    """Different seeds give different Hutchinson estimates (the PRNG fold
    is live inside the artifact), same seed reproduces bitwise."""
    m = _score_model()
    f = serving.deserialize_log_prob(
        serving.export_log_prob(m, atol=1e-3, rtol=1e-3)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    a, b, c = f(x, seed=1), f(x, seed=1), f(x, seed=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 0.0


@pytest.mark.slow
def test_sampler_roundtrip_all_families():
    """export_sampler: artifact output equals the live deterministic
    base->data map, with symbolic batch."""
    m = _score_model()
    f = serving.deserialize_sampler(serving.export_sampler(m, atol=1e-3, rtol=1e-3))
    base = jax.random.normal(jax.random.PRNGKey(0), (24, 2))
    ref = jax.jit(
        lambda mm, bb: mm.sample_ode_from_base(bb, atol=1e-3, rtol=1e-3)[0]
    )(m, base)
    # symbolic-batch lowering fuses differently than the concrete jit:
    # agreement is f32-rounding-level (rel ~1e-6), not bitwise
    np.testing.assert_allclose(np.asarray(f(base)), np.asarray(ref), rtol=1e-5, atol=1e-4)

    flow = ODEFlow.create(
        jax.random.PRNGKey(4), target_dimension=2, hidden_units=(32,)
    )
    g = serving.deserialize_sampler(
        serving.export_sampler(flow, atol=1e-3, rtol=1e-3)
    )
    ref = jax.jit(lambda mm, bb: mm.sample(bb, atol=1e-3, rtol=1e-3)[0])(flow, base)
    np.testing.assert_allclose(np.asarray(g(base)), np.asarray(ref), rtol=1e-5, atol=1e-4)

    sym = SymplecticFlowModel.create(
        jax.random.PRNGKey(6), n_data_dims=2, units=(32,)
    )
    joint = jax.random.normal(jax.random.PRNGKey(1), (24, 4))
    h = serving.deserialize_sampler(
        serving.export_sampler(sym, options={"num_steps": 3})
    )
    ref = jax.jit(
        lambda mm, bb: mm.sample(None, (24, 2), num_steps=3, base=bb)
    )(sym, joint)
    np.testing.assert_allclose(np.asarray(h(joint)), np.asarray(ref), rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_sampler_conditional_population():
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(1), VPSDE(), n_dimensions=2, n_conditionals=3,
        units=(32,),
    )
    f = serving.deserialize_sampler(serving.export_sampler(m))
    base = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    c = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    ref = jax.jit(lambda mm, bb, cc: mm.forward(bb, conditional=cc)[0])(m, base, c)
    np.testing.assert_allclose(np.asarray(f(base, c)), np.asarray(ref), rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_symbolic_export_fused_kernel_contract():
    """Symbolic-batch exports cannot run a pallas_call: an EXPLICIT
    use_fused_kernel=True raises (never a silent numerics downgrade),
    while the auto (None) setting silently takes the plain-XLA variant
    and the artifact matches the plain path."""
    cfg = ScoreMLPConfig(n_dimensions=2, units=(128,))
    m_pinned = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg),
        net=cfg,
        sde=VESDE(),
        trace_mode="hutchinson",
        use_fused_kernel=True,
    )
    with pytest.raises(ValueError, match="concrete grid"):
        serving.export_log_prob(m_pinned, atol=1e-3, rtol=1e-3)

    m_auto = dataclasses.replace(m_pinned, use_fused_kernel=None)
    f = serving.deserialize_log_prob(
        serving.export_log_prob(m_auto, atol=1e-3, rtol=1e-3)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    m_plain = dataclasses.replace(m_pinned, use_fused_kernel=False)
    lp_ref = jax.jit(
        lambda mm, xx, kk: mm.log_prob(xx, key=kk, atol=1e-3, rtol=1e-3)[0]
    )(m_plain, x, jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(f(x, seed=5)), np.asarray(lp_ref), rtol=1e-5, atol=1e-5
    )

    # samplers reject silently-droppable knobs per family
    from flowfusion_tpu.models.population import PopulationModelDiffusion
    from flowfusion_tpu.ops.sde import VPSDE

    pop = PopulationModelDiffusion.create(
        jax.random.PRNGKey(2), VPSDE(), n_dimensions=2, units=(32,)
    )
    with pytest.raises(ValueError, match="pins sampling tolerances"):
        serving.export_sampler(pop, atol=1e-8, rtol=1e-8)
    sym = SymplecticFlowModel.create(jax.random.PRNGKey(3), n_data_dims=2, units=(32,))
    with pytest.raises(ValueError, match="fixed-step"):
        serving.export_sampler(sym, method="rk4")


@pytest.mark.slow
def test_population_volume_corrected_export():
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(1), VPSDE(), n_dimensions=2, units=(32,),
        trace_mode="hutchinson", scale=jnp.asarray([2.0, 3.0]),
    )
    f_std = serving.deserialize_log_prob(
        serving.export_log_prob(m, atol=1e-3, rtol=1e-3)
    )
    f_vol = serving.deserialize_log_prob(
        serving.export_log_prob(m, atol=1e-3, rtol=1e-3, volume_corrected=True)
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    diff = np.asarray(f_vol(x, seed=3)) - np.asarray(f_std(x, seed=3))
    np.testing.assert_allclose(
        diff, -float(np.log(2.0) + np.log(3.0)), atol=1e-5
    )


def test_symplectic_leapfrog_export():
    sym = SymplecticFlowModel.create(
        jax.random.PRNGKey(6), n_data_dims=2, units=(32,)
    )
    joint = jax.random.normal(jax.random.PRNGKey(1), (12, 4))
    h = serving.deserialize_sampler(
        serving.export_sampler(
            sym, options={"num_steps": 2, "method": "leapfrog"}
        )
    )
    ref = jax.jit(
        lambda mm, bb: mm.sample(
            None, (12, 2), num_steps=2, method="leapfrog", base=bb
        )
    )(sym, joint)
    np.testing.assert_allclose(
        np.asarray(h(joint)), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_tpu_symbolic_guard_rejects_crash_families(monkeypatch):
    """The TPU symbolic-batch guard covers BOTH recorded compiler-crash
    families on the log-prob path — exact trace AND conditional models
    (the plain-XLA conditional RHS loop SIGILLs the TPU compiler;
    BENCHMARKS.md) — while leaving the sampler path (no divergence loop)
    and fixed-batch exports alone.  Backend faked to 'tpu': the guard
    must fire BEFORE any lowering, so no TPU client is needed."""
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=3, units=(32,))
    m_cond = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg),
        net=cfg,
        sde=VESDE(),
        trace_mode="hutchinson",
    )
    m_exact = _score_model(trace_mode="exact")

    # fixed-batch conditional export works (CPU backend, real lowering)
    f = serving.deserialize_log_prob(
        serving.export_log_prob(m_cond, batch=8, atol=1e-3, rtol=1e-3)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    c = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    assert np.all(np.isfinite(np.asarray(f(x, c, seed=3))))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="conditional RHS loop"):
        serving.export_log_prob(m_cond, atol=1e-3, rtol=1e-3)
    with pytest.raises(ValueError, match="exact-trace graph crashes"):
        serving.export_log_prob(m_exact, atol=1e-3, rtol=1e-3)
    # the sampler path integrates no divergence loop: neither family is
    # blocked there (guard scope is likelihood-only)
    serving._plain_xla_variant(m_cond, likelihood=False)
    serving._plain_xla_variant(m_exact, likelihood=False)


def test_export_refused_is_valueerror():
    # back-compat: pre-round-4 callers caught ValueError
    assert issubclass(serving.ExportRefused, ValueError)


def test_guard_keys_off_target_platforms_not_host(monkeypatch):
    """ADVICE r3: a TPU-hosted export targeting cpu-only must not be
    refused, and a CPU-hosted export whose platforms include 'tpu' must
    be — the artifact, not the host, is what crashes."""
    m_exact = _score_model(trace_mode="exact")

    # CPU host (real), platforms includes tpu -> refuse before lowering
    with pytest.raises(serving.ExportRefused, match="exact-trace"):
        serving.export_log_prob(m_exact, platforms=("tpu", "cpu"))

    # faked TPU host, platforms cpu-only -> allowed (and lowers for cpu,
    # which works on this host)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    blob = serving.export_log_prob(
        m_exact, platforms=("cpu",), atol=1e-3, rtol=1e-3
    )
    monkeypatch.undo()
    f = serving.deserialize_log_prob(blob)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    assert np.all(np.isfinite(np.asarray(f(x))))


def test_bucketed_logprob_serves_any_batch(tmp_path):
    """export_log_prob_bucketed: one bundle, a ladder of fixed-batch
    artifacts, any request size served by pad-to-next-bucket (chunked by
    the largest bucket when oversize)."""
    # exact trace: deterministic, so padded/chunked solves deviate from
    # the one-shot solve only through batch-global adaptive step control
    # (O(tolerance)); Hutchinson would add probe-draw differences since
    # probe shapes track the padded batch
    m = _score_model(trace_mode="exact")
    blob = serving.export_log_prob_bucketed(
        m, batches=(4, 16), atol=1e-4, rtol=1e-4
    )
    path = tmp_path / "bundle.bin"
    serving.save_artifact(str(path), blob)
    f = serving.deserialize_log_prob_bucketed(
        serving.load_artifact(str(path))
    )
    assert f.buckets == (4, 16)

    ref = jax.jit(lambda mm, xx: mm.log_prob(xx, atol=1e-4, rtol=1e-4)[0])
    # in-bucket, padded, and chunked (37 = 16 + 16 + pad-to-16(5)) sizes
    for n in (3, 4, 16, 37):
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 2))
        lp = f(x, seed=5)
        assert lp.shape == (n,)
        # O(tolerance) deviation: different batch compositions change the
        # batch-global accept/reject sequence (same contract as
        # data_parallel_per_shard; shrinks with rtol)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(ref(m, x)), atol=5e-3
        )
    assert f(jnp.zeros((0, 2))).shape == (0,)


def test_bucketed_logprob_conditional_roundtrip():
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=3, units=(32,))
    m = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg),
        net=cfg,
        sde=VESDE(),
        trace_mode="hutchinson",
    )
    f = serving.deserialize_log_prob_bucketed(
        serving.export_log_prob_bucketed(
            m, batches=(8,), atol=1e-3, rtol=1e-3
        )
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    c = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    lp = f(x, c, seed=1)
    assert lp.shape == (5,) and np.all(np.isfinite(np.asarray(lp)))
    with pytest.raises(ValueError, match="conditional"):
        f(x)


def test_concrete_batch_export_aligns_kernel_to_targets(monkeypatch):
    """Round-4 review fix: batch=N exports key the fused kernel off the
    TARGET platforms, not the tracing host — a CPU host exporting an
    exact-trace likelihood for TPU must ship the fused kernel (the plain
    graph is the crash family), and mixed tpu+cpu targets are refused."""
    m_exact = _score_model(trace_mode="exact")

    # CPU host -> TPU target: kernel forced on; export lowers Mosaic
    blob = serving.export_log_prob(
        m_exact, batch=8, atol=1e-3, rtol=1e-3, platforms=("tpu",)
    )
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    # mixed targets with a crash-family likelihood: one artifact cannot
    # serve both
    with pytest.raises(serving.ExportRefused, match="per .?platform"):
        serving.export_log_prob(
            m_exact, batch=8, atol=1e-3, rtol=1e-3,
            platforms=("tpu", "cpu"),
        )

    # (mocked) TPU host -> cpu-only target: kernel switched off so the
    # artifact is servable; real CPU lowering + call round-trip
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    blob = serving.export_log_prob(
        m_exact, batch=8, atol=1e-3, rtol=1e-3, platforms=("cpu",)
    )
    monkeypatch.undo()
    f = serving.deserialize_log_prob(blob)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    assert np.all(np.isfinite(np.asarray(f(x))))

    # bare-string platforms is a loud TypeError, not silently {'t','p','u'}
    with pytest.raises(TypeError, match="bare string"):
        serving.export_log_prob(m_exact, platforms="tpu")


def test_bucketed_dispatcher_validates_conditional():
    m = _score_model()  # unconditional
    f = serving.deserialize_log_prob_bucketed(
        serving.export_log_prob_bucketed(m, batches=(8,), atol=1e-3, rtol=1e-3)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    with pytest.raises(ValueError, match="unconditional"):
        f(x, jax.random.normal(jax.random.PRNGKey(2), (5, 3)))

    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=3, units=(32,))
    mc = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg,
        sde=VESDE(), trace_mode="hutchinson",
    )
    fc = serving.deserialize_log_prob_bucketed(
        serving.export_log_prob_bucketed(mc, batches=(8,), atol=1e-3, rtol=1e-3)
    )
    with pytest.raises(ValueError, match="rows"):
        fc(x, jax.random.normal(jax.random.PRNGKey(2), (3, 3)))


def test_population_conditional_export_aligns_to_tpu_target():
    """The population wrapper (conditional = the other crash family) gets
    the same target-platform kernel alignment: a CPU host exporting
    batch=N for TPU ships the fused kernel, not the plain conditional
    RHS graph."""
    m = PopulationModelDiffusion.create(
        jax.random.PRNGKey(1), VPSDE(), n_dimensions=2, n_conditionals=3,
        units=(32,), trace_mode="hutchinson",
    )
    blob = serving.export_log_prob(
        m, batch=8, atol=1e-3, rtol=1e-3, platforms=("tpu",)
    )
    assert len(blob) > 0
    with pytest.raises(serving.ExportRefused, match="per .?platform"):
        serving.export_log_prob(m, batch=8, platforms=("tpu", "cpu"))


def test_deserialize_log_prob_rejects_bundle_blob():
    m = _score_model()
    bundle = serving.export_log_prob_bucketed(
        m, batches=(8,), atol=1e-3, rtol=1e-3
    )
    with pytest.raises(ValueError, match="bucketed bundle"):
        serving.deserialize_log_prob(bundle)


def test_deserialize_sampler_rejects_bundle_blob():
    """Both single-artifact deserializers must reject a bucketed bundle
    with the actionable message, not an opaque jax.export parse error."""
    m = _score_model()
    bundle = serving.export_log_prob_bucketed(
        m, batches=(8,), atol=1e-3, rtol=1e-3
    )
    with pytest.raises(ValueError, match="bucketed bundle"):
        serving.deserialize_sampler(bundle)


# ---------------------------------------------------------------------------
# provenance stamps (round 5)
# ---------------------------------------------------------------------------


def test_provenance_roundtrip_and_stamp_contents():
    """Every exported blob carries a provenance envelope; a matched
    toolchain deserializes silently and exposes .provenance."""
    import warnings

    import jaxlib

    import flowfusion_tpu

    m = _score_model()
    blob = serving.export_log_prob(m, atol=1e-4, rtol=1e-4)
    assert bytes(blob[:8]) == serving._PROV_MAGIC
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a matched stamp must not warn
        f = serving.deserialize_log_prob(blob)
    assert f.provenance["package_version"] == flowfusion_tpu.__version__
    assert f.provenance["jax"] == jax.__version__
    assert f.provenance["jaxlib"] == jaxlib.__version__
    assert f.provenance["platforms"] == [jax.default_backend()]
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    assert f(x, seed=1).shape == (8,)


def test_provenance_mismatch_warns_then_strict_refuses(monkeypatch):
    m = _score_model()
    blob = serving.export_log_prob(m, atol=1e-4, rtol=1e-4)
    # simulate serving under a bumped package version
    import flowfusion_tpu

    monkeypatch.setattr(flowfusion_tpu, "__version__", "99.0.0")
    with pytest.warns(UserWarning, match="different toolchain"):
        f = serving.deserialize_log_prob(blob)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    assert f(x).shape == (4,)  # warn-mode still serves
    with pytest.raises(ValueError, match="strict=True"):
        serving.deserialize_log_prob(blob, strict=True)


def test_provenance_preprovenance_blob_passes_through():
    """Blobs exported before the provenance envelope (raw jax.export
    bytes) still deserialize — no magic, no stamp, no warning."""
    from jax import export as jexp

    m = _score_model()
    blob = serving.export_log_prob(m, atol=1e-4, rtol=1e-4)
    raw, meta = serving._strip_provenance(blob, strict=False)
    assert meta is not None
    f = serving.deserialize_log_prob(raw)  # unwrapped = legacy artifact
    assert f.provenance is None
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    assert f(x).shape == (4,)


def test_provenance_bucketed_single_warning(monkeypatch):
    """A version-mismatched bucket bundle warns ONCE (bundle level), not
    once per bucket, and refuses under strict=True."""
    import warnings

    import flowfusion_tpu

    export_version = flowfusion_tpu.__version__
    m = _score_model()
    blob = serving.export_log_prob_bucketed(
        m, batches=(4, 8), atol=1e-3, rtol=1e-3
    )
    monkeypatch.setattr(flowfusion_tpu, "__version__", "99.0.0")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        f = serving.deserialize_log_prob_bucketed(blob)
    toolchain = [w for w in rec if "different toolchain" in str(w.message)]
    assert len(toolchain) == 1
    assert f.provenance["package_version"] == export_version
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 2))
    assert f(x).shape == (6,)
    with pytest.raises(ValueError, match="strict=True"):
        serving.deserialize_log_prob_bucketed(blob, strict=True)


def test_provenance_sampler_stamp(monkeypatch):
    m = _score_model()
    blob = serving.export_sampler(m, batch=4)
    f = serving.deserialize_sampler(blob)
    assert f.provenance["package"] == "flowfusion_tpu"
    import flowfusion_tpu

    monkeypatch.setattr(flowfusion_tpu, "__version__", "99.0.0")
    with pytest.raises(ValueError, match="strict=True"):
        serving.deserialize_sampler(blob, strict=True)


# ---------------------------------------------------------------------------
# target-platform kernel guards (round-5 ADVICE)
# ---------------------------------------------------------------------------


def test_explicit_fused_true_refused_for_non_tpu_targets():
    """use_fused_kernel=True bakes a pallas_call; any non-TPU target in
    the set makes the artifact unservable — refuse, mirroring the
    symbolic-batch guard."""
    m = dataclasses.replace(_score_model(), use_fused_kernel=True)
    with pytest.raises(serving.ExportRefused, match="non-TPU"):
        serving.export_log_prob(
            m, batch=8, atol=1e-3, rtol=1e-3, platforms=("cpu",)
        )
    with pytest.raises(serving.ExportRefused, match="non-TPU"):
        serving.export_log_prob(
            m, batch=8, atol=1e-3, rtol=1e-3, platforms=("cpu", "tpu")
        )
    with pytest.raises(serving.ExportRefused, match="non-TPU"):
        serving.export_sampler(m, batch=8, platforms=("cpu",))


def test_mixed_platform_auto_dispatch_forces_plain_xla(monkeypatch):
    """Mixed tpu+cpu targets with auto kernel dispatch (None) on a
    'TPU host' must bake the plain-XLA graph (every target can run it),
    not the host-keyed pallas_call."""
    seen = {}

    orig = serving._logprob_closure

    def spy(model, *a, **k):
        inner = (
            model.score_model
            if isinstance(model, PopulationModelDiffusion)
            else model
        )
        seen["fused"] = inner.use_fused_kernel
        return orig(model, *a, **k)

    monkeypatch.setattr(serving, "_logprob_closure", spy)
    # hutchinson + unconditional = non-crash family; auto dispatch
    m = _score_model()
    assert m.use_fused_kernel is None
    blob = serving.export_log_prob(
        m, batch=8, atol=1e-3, rtol=1e-3, platforms=("tpu", "cpu")
    )
    assert seen["fused"] is False
    f = serving.deserialize_log_prob(blob)
    assert sorted(f.provenance["platforms"]) == ["cpu", "tpu"]


def test_provenance_corrupt_envelope_diagnosed():
    """Truncated or damaged provenance envelopes fail with an actionable
    message, not a cryptic decode error."""
    m = _score_model()
    blob = serving.export_log_prob(m, atol=1e-4, rtol=1e-4)
    with pytest.raises(ValueError, match="truncated"):
        serving.deserialize_log_prob(blob[:20])
    damaged = bytearray(blob)
    damaged[14] ^= 0xFF  # flip a byte inside the JSON header
    with pytest.raises(ValueError, match="damaged"):
        serving.deserialize_log_prob(bytes(damaged))
