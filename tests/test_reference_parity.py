"""Execution parity against the ACTUAL reference implementation.

Every other test file checks this framework against self-built oracles;
this one imports ``/root/reference/flowfusion`` (torch CPU) directly and
asserts numerical agreement on every non-ODE-solver path:

  * net forwards: MLP (diffusion.py:9-121), ODEFlow/ConditionalODEFlow
    velocity (flow.py:62-74, 506-524), SymplecticMLP (symplectic.py:11-123)
  * ScoreModel.score / ode_drift (diffusion.py:215-238, 258-279)
  * trace-estimator dispatch in forward: exact, Hutchinson, Hutch++ and
    XTrace cores with identical injected probes (diffusion.py:300-508)
  * DSM + likelihood-weighted losses with injected (t, z)
    (diffusion.py:1369-1463)
  * the Euler--Maruyama reverse-SDE loop with injected noise
    (diffusion.py:510-563)
  * all SDE scalar functions (diffusion.py:818-1366)
  * flow interpolant/loss (flow.py:191-256) and exact divergence
    (flow.py:122-167)

torchdiffeq is not installed in this sandbox; it is stubbed in
``sys.modules`` before the reference import (only ODE-solver entry points
need it, and none are exercised here — solver parity is covered by
tests/test_integrate.py against torchdiffeq-convention oracles).

Weights always flow torch -> jax through ``flowfusion_tpu.utils.convert``,
so these tests double as the checkpoint-migration contract.
"""

import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# --- import the reference with torchdiffeq stubbed -----------------------
torch = pytest.importorskip("torch")

if "torchdiffeq" not in sys.modules:
    _stub = types.ModuleType("torchdiffeq")

    def _no_odeint(*a, **k):  # pragma: no cover - never called in these tests
        raise RuntimeError("torchdiffeq stub: ODE solves not exercised here")

    _stub.odeint = _no_odeint
    _stub.odeint_adjoint = _no_odeint
    sys.modules["torchdiffeq"] = _stub

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

ref_diff = pytest.importorskip("flowfusion.diffusion")
ref_flow = pytest.importorskip("flowfusion.flow")
ref_sym = pytest.importorskip("flowfusion.symplectic")

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.models.nets import (
    ScoreMLPConfig,
    SymplecticMLPConfig,
    VelocityMLPConfig,
    apply_score_mlp,
    apply_symplectic_mlp,
    apply_velocity_mlp,
)
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops import losses as losses_lib
from flowfusion_tpu.ops import sde as sde_lib
from flowfusion_tpu.ops import trace as trace_lib
from flowfusion_tpu.ops.integrate.fixed import euler_maruyama
from flowfusion_tpu.utils import convert

torch.manual_seed(0)
torch.set_default_dtype(torch.float32)


def t2n(x):
    return np.asarray(x.detach().cpu().numpy(), np.float32)


def n2t(x):
    # np.array (copy) rather than np.asarray: jax arrays export as
    # non-writable numpy views, which torch.from_numpy warns about.
    return torch.from_numpy(np.array(x, np.float32))


def sd_np(module):
    return {k: t2n(v) for k, v in module.state_dict().items()}


SDE_PAIRS = [
    ("ve", lambda: ref_diff.VESDE(), lambda: sde_lib.VESDE()),
    ("vp", lambda: ref_diff.VPSDE(), lambda: sde_lib.VPSDE()),
    ("subvp", lambda: ref_diff.SUBVPSDE(), lambda: sde_lib.SUBVPSDE()),
]


def make_ref_mlp(n_dim=2, n_cond=0, units=(32, 32), seed=1):
    torch.manual_seed(seed)
    return ref_diff.MLP(
        n_dimensions=n_dim, n_conditionals=n_cond, units=list(units)
    )


def make_pair_score_model(sde_name="ve", n_dim=2, n_cond=0, units=(32, 32),
                          no_sigma=False, seed=1, **ref_kwargs):
    """(reference ScoreModel, converted flowfusion_tpu ScoreModel)."""
    _, mk_ref_sde, mk_my_sde = next(p for p in SDE_PAIRS if p[0] == sde_name)
    net = make_ref_mlp(n_dim, n_cond, units, seed)
    ref = ref_diff.ScoreModel(
        model=net, sde=mk_ref_sde(), no_sigma=no_sigma, **ref_kwargs
    )
    cfg = ScoreMLPConfig(
        n_dimensions=n_dim, n_conditionals=n_cond, units=tuple(units)
    )
    params = convert.score_mlp_from_torch(sd_np(net), len(units) + 1)
    mine = ScoreModel(
        params=params, net=cfg, sde=mk_my_sde(), no_sigma=no_sigma,
        use_fused_kernel=False,
    )
    return ref, mine


# =========================================================================
# Net forwards
# =========================================================================


@pytest.mark.parametrize("n_cond", [0, 3])
def test_score_mlp_forward(n_cond, rng):
    net = make_ref_mlp(n_cond=n_cond)
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=n_cond, units=(32, 32))
    params = convert.score_mlp_from_torch(sd_np(net), 3)

    x = rng.standard_normal((16, 2)).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, 16).astype(np.float32)
    c = rng.standard_normal((16, n_cond)).astype(np.float32) if n_cond else None

    ref_out = t2n(net(n2t(t), n2t(x), conditional=None if c is None else n2t(c)))
    my_out = np.asarray(apply_score_mlp(cfg, params, jnp.asarray(t), jnp.asarray(x),
                                        None if c is None else jnp.asarray(c)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-6, rtol=1e-5)


def test_score_mlp_scalar_t_broadcast(rng):
    """Reference broadcasts 0-d t over the batch (diffusion.py:105-106)."""
    net = make_ref_mlp()
    cfg = ScoreMLPConfig(n_dimensions=2, n_conditionals=0, units=(32, 32))
    params = convert.score_mlp_from_torch(sd_np(net), 3)
    x = rng.standard_normal((8, 2)).astype(np.float32)
    ref_out = t2n(net(torch.tensor(0.37), n2t(x)))
    my_out = np.asarray(apply_score_mlp(cfg, params, jnp.asarray(0.37), jnp.asarray(x)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-6, rtol=1e-5)


def test_velocity_net_forward(rng):
    torch.manual_seed(2)
    ref = ref_flow.ODEFlow(target_dimension=3, hidden_units=[32, 32])
    cfg = VelocityMLPConfig(target_dimension=3, hidden_units=(32, 32))
    params = convert.velocity_mlp_from_torch(sd_np(ref))
    x = rng.standard_normal((16, 3)).astype(np.float32)
    t = rng.uniform(0, 1, 16).astype(np.float32)
    ref_out = t2n(ref.dynamics(n2t(t), (n2t(x),)))
    my_out = np.asarray(apply_velocity_mlp(cfg, params, jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-6, rtol=1e-5)


def test_conditional_velocity_net_forward(rng):
    """ConditionalODEFlow.dynamics standardizes cond inside (flow.py:575-580)."""
    torch.manual_seed(3)
    c_shift = np.array([0.5, -1.0], np.float32)
    c_scale = np.array([2.0, 0.5], np.float32)
    ref = ref_flow.ConditionalODEFlow(
        target_dimension=2, conditional_dimension=2, hidden_units=[32, 32],
        conditional_shift=n2t(c_shift), conditional_scale=n2t(c_scale),
    )
    my = ODEFlow(
        params=convert.velocity_mlp_from_torch(sd_np(ref)),
        target_shift=jnp.zeros(2), target_scale=jnp.ones(2),
        conditional_shift=jnp.asarray(c_shift),
        conditional_scale=jnp.asarray(c_scale),
        net=VelocityMLPConfig(target_dimension=2, conditional_dimension=2,
                              hidden_units=(32, 32)),
        use_fused_kernel=False,
    )
    x = rng.standard_normal((16, 2)).astype(np.float32)
    c = rng.standard_normal((16, 2)).astype(np.float32)
    t = rng.uniform(0, 1, 16).astype(np.float32)
    ref_v, ref_zeros = ref.dynamics(n2t(t), (n2t(x), n2t(c)))
    my_v = np.asarray(my.dynamics(jnp.asarray(t), jnp.asarray(x), jnp.asarray(c)))
    np.testing.assert_allclose(my_v, t2n(ref_v), atol=1e-6, rtol=1e-5)
    assert np.all(t2n(ref_zeros) == 0.0)


@pytest.mark.parametrize("n_cond", [0, 2])
def test_symplectic_net_forward(n_cond, rng):
    torch.manual_seed(4)
    ref = ref_sym.SymplecticMLP(
        n_data_dims=2, n_conditionals=n_cond, embedding_dimensions=8,
        units=[32, 32],
    )
    cfg = SymplecticMLPConfig(
        n_data_dims=2, n_conditionals=n_cond, embedding_dimensions=8,
        units=(32, 32),
    )
    params = convert.symplectic_mlp_from_torch(sd_np(ref))
    state = rng.standard_normal((16, 4)).astype(np.float32)
    t = rng.uniform(0, 1, 16).astype(np.float32)
    c = rng.standard_normal((16, n_cond)).astype(np.float32) if n_cond else None
    ref_out = t2n(ref(n2t(t), n2t(state), None if c is None else n2t(c)))
    my_out = np.asarray(apply_symplectic_mlp(
        cfg, params, jnp.asarray(t), jnp.asarray(state),
        None if c is None else jnp.asarray(c)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-6, rtol=1e-5)


# =========================================================================
# SDE scalar functions
# =========================================================================


def _close_or_more_accurate(mine, ref32, ref64, atol=1e-6, rtol=1e-5):
    """Elementwise: match the f32 reference, OR beat it against its own f64
    run.  The second branch covers this framework's documented expm1
    reformulations (ops/sde.py:209-213, 233-250): exact-math-identical to
    the reference but immune to the 1 - exp(-x) cancellation that costs the
    f32 reference ~0.6% relative error at t ~ epsilon."""
    mine, ref32, ref64 = map(np.asarray, (mine, ref32, ref64))
    mine, ref32 = np.broadcast_arrays(mine, ref32)
    ref64 = np.broadcast_to(ref64, mine.shape)
    matches = np.abs(mine - ref32) <= atol + rtol * np.abs(ref32)
    more_accurate = np.abs(mine - ref64) <= np.abs(ref32 - ref64) + 1e-9
    bad = ~(matches | more_accurate)
    assert not bad.any(), (
        f"{bad.sum()} elements neither match f32 reference nor beat it: "
        f"mine={mine[bad][:5]} ref32={ref32[bad][:5]} ref64={ref64[bad][:5]}"
    )


@pytest.mark.parametrize("name,mk_ref,mk_my", SDE_PAIRS)
def test_sde_scalars(name, mk_ref, mk_my, rng):
    ref, my = mk_ref(), mk_my()
    ref64 = mk_ref().double()
    t_np = np.linspace(ref.epsilon if np.isscalar(ref.epsilon) else 1e-5,
                       1.0, 23).astype(np.float32)
    x_np = rng.standard_normal((23, 4)).astype(np.float32)
    t_t, x_t = n2t(t_np), n2t(x_np)
    t_d, x_d = t_t.double(), x_t.double()
    t_j, x_j = jnp.asarray(t_np), jnp.asarray(x_np)

    _close_or_more_accurate(
        my.sigma(t_j), t2n(ref.sigma(t_t)), ref64.sigma(t_d).numpy())
    _close_or_more_accurate(
        my.diffusion(t_j, x_j), t2n(ref.diffusion(t_t, x_t)),
        ref64.diffusion(t_d, x_d).numpy())
    np.testing.assert_allclose(
        np.asarray(my.drift(t_j, x_j)),
        np.broadcast_to(t2n(ref.drift(t_t, x_t)), x_np.shape),
        atol=1e-6, rtol=1e-5)

    ref_mu, ref_std = ref.marginal_prob_scalars(t_t)
    mu64, std64 = ref64.marginal_prob_scalars(t_d)
    my_mu, my_std = my.marginal_prob_scalars(t_j)
    np.testing.assert_allclose(np.asarray(my_mu), t2n(ref_mu), atol=1e-6, rtol=1e-5)
    _close_or_more_accurate(my_std, t2n(ref_std), std64.numpy())

    ref_mean, ref_sig = ref.marginal_prob(t_t, x_t)
    mean64, sig64 = ref64.marginal_prob(t_d, x_d)
    my_mean, my_sig = my.marginal_prob(t_j, x_j)
    np.testing.assert_allclose(np.asarray(my_mean), t2n(ref_mean), atol=1e-6, rtol=1e-5)
    _close_or_more_accurate(my_sig, t2n(ref_sig), sig64.numpy())

    if hasattr(ref, "beta"):
        np.testing.assert_allclose(
            np.asarray(my.beta(t_j)), t2n(ref.beta(t_t)), atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("name,mk_ref,mk_my", SDE_PAIRS)
def test_prior_log_prob(name, mk_ref, mk_my, rng):
    """My prior_log_prob vs the reference's torch Normal prior."""
    ref, my = mk_ref(), mk_my()
    x_np = rng.standard_normal((16, 3)).astype(np.float32) * 2.0
    if name == "ve":
        prior = ref.prior([3])
    else:
        prior = ref.prior([3])
    # Both sides are elementwise Normal log-pdfs; callers sum over dims.
    ref_lp = t2n(prior.log_prob(n2t(x_np)).sum(dim=-1))
    my_lp = np.asarray(my.prior_log_prob(jnp.asarray(x_np)).sum(axis=-1))
    np.testing.assert_allclose(my_lp, ref_lp, atol=1e-5, rtol=1e-5)


# =========================================================================
# ScoreModel.score / ode_drift
# =========================================================================


@pytest.mark.parametrize("sde_name", ["ve", "vp", "subvp"])
@pytest.mark.parametrize("no_sigma", [False, True])
def test_score_and_ode_drift(sde_name, no_sigma, rng):
    ref, my = make_pair_score_model(sde_name, no_sigma=no_sigma)
    x = rng.standard_normal((16, 2)).astype(np.float32)
    t = rng.uniform(0.05, 1.0, 16).astype(np.float32)

    ref_s = t2n(ref.score(n2t(t), n2t(x)))
    my_s = np.asarray(my.score(jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(my_s, ref_s, atol=1e-6, rtol=1e-5)

    ref_d = t2n(ref.ode_drift(n2t(t), n2t(x)))
    my_d = np.asarray(my.ode_drift(jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(my_d, ref_d, atol=1e-6, rtol=1e-5)


def test_score_conditional(rng):
    ref, my = make_pair_score_model("ve", n_cond=3)
    x = rng.standard_normal((16, 2)).astype(np.float32)
    c = rng.standard_normal((16, 3)).astype(np.float32)
    t = rng.uniform(0.05, 1.0, 16).astype(np.float32)
    ref_s = t2n(ref.score(n2t(t), n2t(x), conditional=n2t(c)))
    my_s = np.asarray(my.score(jnp.asarray(t), jnp.asarray(x), jnp.asarray(c)))
    np.testing.assert_allclose(my_s, ref_s, atol=1e-6, rtol=1e-5)


# =========================================================================
# Trace-estimator dispatch (reference forward with prob=True)
# =========================================================================


def _rhs_pair(rng, sde_name="vp", D=4, batch=12):
    ref, my = make_pair_score_model(sde_name, n_dim=D, units=(32, 32))
    x = rng.standard_normal((batch, D)).astype(np.float32)
    t = np.float32(0.63)
    t_vec = np.full((batch,), t, np.float32)

    def my_f(xx):
        return my.ode_drift(jnp.full((xx.shape[0],), t, jnp.float32), xx)

    return ref, my, x, t_vec, my_f


def test_exact_divergence_vs_reference(rng):
    ref, my, x, t_vec, my_f = _rhs_pair(rng)
    ref.prob = True
    # The exact path vmaps per-sample closures that re-batch x to (1, D)
    # (diffusion.py:485-503); it only broadcasts with 0-d t, which is what
    # torchdiffeq feeds it.
    x_dot_ref, div_ref = ref(torch.tensor(float(t_vec[0])), (n2t(x),))
    x_dot_my, div_my = trace_lib.exact_divergence(my_f, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(x_dot_my), t2n(x_dot_ref),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(div_my), t2n(div_ref)[:, 0],
                               atol=1e-5, rtol=1e-5)


def test_hutchinson_divergence_vs_reference(rng):
    ref, my, x, t_vec, my_f = _rhs_pair(rng)
    e = np.sign(rng.standard_normal(x.shape)).astype(np.float32)
    ref.prob = True
    ref.hutch = True
    ref.e = n2t(e)
    _, div_ref = ref(n2t(t_vec), (n2t(x),))
    _, div_my = trace_lib.hutchinson_divergence(my_f, jnp.asarray(x), jnp.asarray(e))
    np.testing.assert_allclose(np.asarray(div_my), t2n(div_ref)[:, 0],
                               atol=1e-5, rtol=1e-5)


def _vjp_apply_cols(my_f, x):
    """Column operator applying A = J^T — the reference's operator
    (diffusion.py:356-373), so sketches match realization-for-realization."""
    _, vjp = jax.vjp(my_f, x)

    def apply_cols(cols):
        return [jax.lax.stop_gradient(vjp(c.T)[0].T) for c in cols]

    return apply_cols


def test_hutchpp_core_vs_reference(rng):
    ref, my, x, t_vec, my_f = _rhs_pair(rng)
    r, m, D, batch = 2, 2, x.shape[1], x.shape[0]
    S = np.sign(rng.standard_normal((r, batch, D))).astype(np.float32)
    G = np.sign(rng.standard_normal((m, batch, D))).astype(np.float32)
    ref.prob = True
    ref.hutchpp = True
    ref.hpp_rank, ref.hpp_vector = r, m
    ref.S, ref.G = n2t(S), n2t(G)
    _, div_ref = ref(n2t(t_vec), (n2t(x),))

    apply_cols = _vjp_apply_cols(my_f, jnp.asarray(x))
    div_my = trace_lib.hutchpp_core(
        apply_cols,
        [jnp.asarray(S[i].T) for i in range(r)],
        [jnp.asarray(G[i].T) for i in range(m)],
    )
    np.testing.assert_allclose(np.asarray(div_my), t2n(div_ref)[:, 0],
                               atol=1e-4, rtol=1e-4)


def test_xtrace_core_vs_reference(rng):
    ref, my, x, t_vec, my_f = _rhs_pair(rng)
    m, D, batch = 2, x.shape[1], x.shape[0]
    # Rademacher probes like the reference; D=4 so collision-singularity
    # (the D=2 hazard documented in ops/trace.py:355-362) is improbable.
    O = np.sign(rng.standard_normal((m, batch, D))).astype(np.float32)
    ref.prob = True
    ref.xtrace = True
    ref.xt_vector = m
    ref.O = n2t(O)
    _, div_ref = ref(n2t(t_vec), (n2t(x),))

    apply_cols = _vjp_apply_cols(my_f, jnp.asarray(x))
    div_my = trace_lib.xtrace_core(
        apply_cols, [jnp.asarray(O[i].T) for i in range(m)]
    )
    np.testing.assert_allclose(np.asarray(div_my), t2n(div_ref)[:, 0],
                               atol=1e-4, rtol=1e-4)


# =========================================================================
# Losses with injected (t, z)
# =========================================================================


def _injected_draws(key, sde, x):
    """The exact (t, z) my loss will draw, as numpy."""
    t, z = losses_lib._draw_t_and_z(key, sde, jnp.asarray(x))
    return np.asarray(t), np.asarray(z)


@pytest.mark.parametrize("loss_name", ["dsm", "lw"])
@pytest.mark.parametrize("sde_name", ["ve", "vp", "subvp"])
def test_loss_parity(loss_name, sde_name, rng, monkeypatch):
    ref, my = make_pair_score_model(sde_name)
    x = rng.standard_normal((32, 2)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    t_np, z_np = _injected_draws(key, my.sde, x)

    # Reference draws from global torch RNG (diffusion.py:1392-1398);
    # inject my draws so both losses see identical (t, z).
    monkeypatch.setattr(torch, "randn_like", lambda xx, **kw: n2t(z_np))
    monkeypatch.setattr(
        torch, "rand",
        lambda *s, **kw: n2t((t_np - my.sde.epsilon) / (my.sde.T - my.sde.epsilon)),
    )

    if loss_name == "dsm":
        ref_loss = ref_diff.denoising_score_matching(ref, n2t(x))
        my_loss = losses_lib.denoising_score_matching(
            my.score, my.sde, key, jnp.asarray(x))
    else:
        ref_loss = ref_diff.log_prob_score_matching(ref, n2t(x))
        my_loss = losses_lib.log_prob_score_matching(
            my.score, my.sde, key, jnp.asarray(x))
    np.testing.assert_allclose(float(my_loss), float(ref_loss.detach()), atol=1e-5,
                               rtol=1e-5)


def test_flow_matching_loss_parity(rng, monkeypatch):
    torch.manual_seed(5)
    shift = np.array([0.3, -0.2], np.float32)
    scale = np.array([1.5, 0.7], np.float32)
    ref = ref_flow.ODEFlow(target_dimension=2, hidden_units=[32, 32],
                           target_shift=n2t(shift), target_scale=n2t(scale))
    my = ODEFlow(
        params=convert.velocity_mlp_from_torch(sd_np(ref)),
        target_shift=jnp.asarray(shift), target_scale=jnp.asarray(scale),
        conditional_shift=None, conditional_scale=None,
        net=VelocityMLPConfig(target_dimension=2, hidden_units=(32, 32)),
        use_fused_kernel=False,
    )
    x = rng.standard_normal((32, 2)).astype(np.float32) * 2.0

    key = jax.random.PRNGKey(11)
    kz, kt = jax.random.split(key)
    xT_np = np.asarray(jax.random.normal(kz, x.shape, jnp.float32))
    t_np = np.asarray(jax.random.uniform(kt, (x.shape[0], 1), jnp.float32))

    monkeypatch.setattr(torch, "randn_like", lambda xx, **kw: n2t(xT_np))
    monkeypatch.setattr(torch, "rand", lambda *s, **kw: n2t(t_np))

    ref_loss = ref.flow_matching_loss(n2t(x))
    my_loss = my.flow_matching_loss(key, jnp.asarray(x))
    np.testing.assert_allclose(float(my_loss), float(ref_loss.detach()), atol=1e-6,
                               rtol=1e-5)


def test_linear_velocity_field_parity(rng):
    torch.manual_seed(6)
    shift = np.array([1.0], np.float32)
    scale = np.array([2.0], np.float32)
    ref = ref_flow.ODEFlow(target_dimension=1, target_shift=n2t(shift),
                           target_scale=n2t(scale))
    my = ODEFlow(
        params=convert.velocity_mlp_from_torch(sd_np(ref)),
        target_shift=jnp.asarray(shift), target_scale=jnp.asarray(scale),
        conditional_shift=None, conditional_scale=None,
        net=VelocityMLPConfig(target_dimension=1),
        use_fused_kernel=False,
    )
    x0 = rng.standard_normal((16, 1)).astype(np.float32)
    xT = rng.standard_normal((16, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (16, 1)).astype(np.float32)
    ref_xt, ref_v = ref.compute_linear_velocity_field(n2t(x0), n2t(xT), n2t(t))
    my_xt, my_v = my.compute_linear_velocity_field(
        jnp.asarray(x0), jnp.asarray(xT), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(my_xt), t2n(ref_xt), atol=1e-6)
    np.testing.assert_allclose(np.asarray(my_v), t2n(ref_v), atol=1e-6)


def test_flow_exact_divergence_parity(rng):
    """My exact divergence vs the reference's per-dimension autograd loop
    (flow.py:122-167) on the same converted velocity field."""
    torch.manual_seed(7)
    ref = ref_flow.ODEFlow(target_dimension=3, hidden_units=[32, 32])
    cfg = VelocityMLPConfig(target_dimension=3, hidden_units=(32, 32))
    params = convert.velocity_mlp_from_torch(sd_np(ref))
    x = rng.standard_normal((12, 3)).astype(np.float32)
    t = rng.uniform(0, 1, 12).astype(np.float32)

    ref_v, ref_div = ref.dynamics_with_jacobian(
        n2t(t), (n2t(x), torch.zeros(12, 1)))

    def my_f(xx):
        return apply_velocity_mlp(cfg, params, jnp.asarray(t), xx)

    my_v, my_div = trace_lib.exact_divergence(my_f, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(my_v), t2n(ref_v), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(my_div), t2n(ref_div)[:, 0],
                               atol=1e-5, rtol=1e-5)


# =========================================================================
# Euler--Maruyama reverse SDE with injected noise
# =========================================================================


class _FixedPrior:
    def __init__(self, x0):
        self._x0 = x0

    def sample(self, shape):
        return self._x0.clone()


@pytest.mark.parametrize("sde_name", ["ve", "vp"])
def test_em_sampler_parity(sde_name, rng, monkeypatch):
    steps = 5
    ref, my = make_pair_score_model(sde_name)
    batch, D = 8, 2
    x0 = rng.standard_normal((batch, D)).astype(np.float32)
    if sde_name == "ve":
        x0 = x0 * 10.0  # prior scale sigma_max

    key = jax.random.PRNGKey(3)
    step_keys = jax.random.split(key, steps)
    noises = [np.asarray(jax.random.normal(k, (batch, D), jnp.float32))
              for k in step_keys]

    # Reference: prior sample + per-step randn_like come from global RNG
    # (diffusion.py:530-558); inject x0 and my noise sequence.
    monkeypatch.setattr(ref.sde, "prior",
                        lambda dims, *a, **k: _FixedPrior(n2t(x0)),
                        raising=False)
    noise_iter = iter(noises)
    monkeypatch.setattr(torch, "randn_like",
                        lambda xx, **kw: n2t(next(noise_iter)))
    ref_out = t2n(ref.sample_sde((batch, D), steps=steps))

    g_fn = my.sde.diffusion
    score = my.score

    def drift_fn(t, x):
        tt = jnp.full((x.shape[0],), t, jnp.float32)
        g = g_fn(tt, x)
        return my.sde.drift(tt, x) - g**2 * score(tt, x)

    def diffusion_fn(t, x):
        return g_fn(jnp.full((x.shape[0],), t, jnp.float32), x)

    res = euler_maruyama(
        key, drift_fn, diffusion_fn, jnp.asarray(x0),
        t0=my.sde.T, t1=my.sde.epsilon, steps=steps, epsilon=my.sde.epsilon,
    )
    np.testing.assert_allclose(np.asarray(res.x_mean), ref_out, atol=1e-5,
                               rtol=1e-5)


def test_gelu_activation_exact_form(rng):
    """torch.nn.GELU defaults to the EXACT erf form; our 'gelu' must match
    it (regression: jax.nn.gelu's default tanh approximation deviated by
    up to ~5e-4, breaking converted-checkpoint parity)."""
    torch.manual_seed(4)
    ref = ref_diff.MLP(
        n_dimensions=2, n_conditionals=0, units=[32],
        activation=torch.nn.GELU(),
    )
    cfg = ScoreMLPConfig(
        n_dimensions=2, n_conditionals=0, units=(32,), activation="gelu"
    )
    params = convert.score_mlp_from_torch(sd_np(ref))
    x = rng.standard_normal((16, 2)).astype(np.float32)
    t = rng.uniform(0, 1, 16).astype(np.float32)
    ref_out = t2n(ref(n2t(t), n2t(x)))
    my_out = np.asarray(apply_score_mlp(cfg, params, jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-6, rtol=1e-5)
