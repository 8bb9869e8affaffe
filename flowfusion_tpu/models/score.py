"""Score-based diffusion model: loss, sampling and exact CNF log-likelihood.

TPU-native redesign of the reference ``ScoreModel``
(/root/reference/flowfusion/diffusion.py:124-815).  The reference object is a
*stateful* ODE right-hand side: it mutates ``self.prob``, ``self.conditional``
and probe tensors mid-solve (diffusion.py:614-617, 697-721) and hands itself
to torchdiffeq.  Here the model is an immutable pytree dataclass; every solve
builds a pure RHS closure with the conditional and trace probes passed
explicitly, so the whole pipeline jits, vmaps and shards.

Parity contract (SURVEY.md §6):
  * score(t,x,c) = net(t,x,c) / sigma(t) unless ``no_sigma``;
  * probability-flow drift  f_tilde = f - g^2 s / 2;
  * ``sample_ode_from_base`` integrates t: 1.0 -> epsilon (the 1.0 is
    hard-coded in the reference, diffusion.py:611) with dopri5 at
    atol=rtol=1e-4, pre-scaling base samples by the prior scale (sigma_max
    for VESDE, diffusion.py:605-608);
  * ``solve_odes_forward`` integrates the augmented state (x, dlogp)
    t: epsilon -> 1.0 at atol=rtol=1e-5 with probes sampled once per solve;
  * ``log_prob`` defaults atol=rtol=1e-4 with min_step=1e-6 and adds the
    prior term sum_d log N(x_T).

Shapes: log-prob outputs are (B,) (the reference returns (B,1); squeeze is
the only difference, documented here once).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import _common
from ..ops import losses as losses_lib
from ..ops import trace as trace_lib
from ..ops.integrate import EMResult, SolverStats, euler_maruyama, odeint
from ..ops.sde import SDE
from .nets import ScoreMLPConfig

__all__ = ["ScoreModel"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScoreModel:
    """Immutable (params, sde, config) bundle with pure methods.

    ``trace_mode`` selects the divergence estimator used by
    ``solve_odes_forward``/``log_prob``: 'exact' (default), 'hutchinson',
    'hutchpp', or 'xtrace' — the reference's boolean flag tangle
    (hutch/hutchpp/xtrace, diffusion.py:158-215) collapsed into one enum.
    """

    params: dict
    # Any hashable config exposing .apply(params, t, x, conditional) works
    # here (the reference accepts any nn.Module as `model`); ScoreMLPConfig
    # is the stock choice.
    net: ScoreMLPConfig = dataclasses.field(metadata=dict(static=True))
    sde: SDE = dataclasses.field(metadata=dict(static=True))
    no_sigma: bool = dataclasses.field(default=False, metadata=dict(static=True))
    trace_mode: str = dataclasses.field(default="exact", metadata=dict(static=True))
    hpp_rank: int = dataclasses.field(default=1, metadata=dict(static=True))
    hpp_vecs: int = dataclasses.field(default=1, metadata=dict(static=True))
    xt_vecs: int = dataclasses.field(default=1, metadata=dict(static=True))
    # Fused Pallas RHS kernel: None = auto (on for TPU backends with a
    # supported stock MLP config), True/False forces.  Applies to the
    # probability-flow solves and the EM sampler drift.
    use_fused_kernel: Optional[bool] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # Matmul dtype inside the fused kernel: 'float32' (parity; default) or
    # 'bfloat16' (fast serving mode: MXU-native, ~1e-3 density accuracy).
    kernel_compute_dtype: str = dataclasses.field(
        default="float32", metadata=dict(static=True)
    )

    # ------------------------------------------------------------------
    # multi-device plumbing
    # ------------------------------------------------------------------
    def _per_shard_variant(self, exact: Optional[bool] = None) -> "ScoreModel":
        """The model each device runs under auto-sharding (shard_map).

        Inside shard_map every device executes a single-device program, so
        on TPU the fused kernel is both safe and required (the plain-XLA
        conditional-RHS graph family crashes this platform's compiler);
        ``auto_fused`` cannot see that from ``jax.devices()`` alone, hence
        the explicit opt-in here.  Off-TPU the auto policy stands.

        ``exact`` declares whether the sharded solve propagates exact-trace
        tangent chains (their tighter feature envelope); forward-only
        entry points (sampling) pass False so wide models still ride the
        kernel per shard.  None = derive from ``trace_mode``.
        """
        return _common.per_shard_variant(self, self._fused_supported(exact=exact))

    # ------------------------------------------------------------------
    # fused-kernel plumbing
    # ------------------------------------------------------------------
    def _fused_supported(self, exact: Optional[bool] = None) -> bool:
        """``exact`` = does the solve at hand propagate exact-trace tangent
        chains?  The feature envelope is per-SOLVE, not per-model: a wide
        (D + C in 17..64) model with ``trace_mode='exact'`` still runs its
        forward-only paths (sampling, EM drift) on the kernel.  None =
        conservative model-wide answer (``trace_mode``)."""
        from ..kernels.fused_mlp import fusable_config, supports_features

        if exact is None:
            exact = self.trace_mode == "exact"
        return (
            isinstance(self.net, ScoreMLPConfig)
            # fusable = directly supported OR liftable by the exact
            # pad-to-lanes transform (kernels.fused_mlp.pad_to_lanes);
            # the kernel entry points pad transparently
            and fusable_config(self.net.units, self.net.activation)
            # wide inputs ride one MXU pass (kernel in_proj); exact trace
            # keeps the tighter bound — its d_out tangent chains scale
            # with the feature count (use a stochastic estimator there)
            and supports_features(
                self.net.n_dimensions + self.net.n_conditionals,
                exact=exact,
            )
        )

    def _fused_available(self, for_exact: bool = False) -> bool:
        """Dispatch policy for the fused Pallas RHS.

        Measured on v5e (V4 feature-major kernel, HIGHEST-precision
        matmuls): the fused RHS is ~1.8x faster than plain XLA for
        Hutchinson likelihood solves at the 2-D flagship config (5.5 vs
        10.6 ns/row marginal) with identical solver step counts and
        mean |dlogp| ~6e-6 — inside the 1e-5 parity contract — and it is
        *required* for exact-trace solves on TPU, where the pure-XLA
        exact graph crashes this platform's compiler.  Auto (None)
        therefore selects the kernel on TPU for every supported config;
        ``use_fused_kernel=False`` forces plain XLA.
        """
        return _common.fused_dispatch(
            self.use_fused_kernel, self._fused_supported(exact=for_exact),
            for_exact=for_exact, what="exact-trace solves",
        )

    def _fused_coeffs(self, t):
        """(c0, c1) with prob-flow drift = c0 x + c1 net(t, x[, c])."""
        t = jnp.asarray(t, jnp.float32)
        c0 = self.sde.drift_coefficient(t)
        c1 = -0.5 * self.sde.diffusion_squared_scalar(t)
        if not self.no_sigma:
            c1 = c1 / self.sde.sigma(t)
        return c0, c1

    # ------------------------------------------------------------------
    # core fields
    # ------------------------------------------------------------------
    def score(
        self, t: jax.Array, x: jax.Array, conditional: Optional[jax.Array] = None
    ) -> jax.Array:
        """s(x, t) = net(t, x, c)[ / sigma(t)] (diffusion.py:215-238)."""
        out = self.net.apply(self.params, t, x, conditional)
        if self.no_sigma:
            return out
        sigma = self.sde.sigma(jnp.asarray(t, jnp.float32))
        sigma = jnp.reshape(sigma, (-1,) + (1,) * (x.ndim - 1))
        return out / sigma

    def ode_drift(
        self, t: jax.Array, x: jax.Array, conditional: Optional[jax.Array] = None
    ) -> jax.Array:
        """Probability-flow drift f - g^2 s / 2 (diffusion.py:258-279)."""
        f = self.sde.drift(t, x)
        g = self.sde.diffusion(t, x)
        return f - 0.5 * g**2 * self.score(t, x, conditional)

    def loss_fn(
        self, key: jax.Array, x: jax.Array, conditional: Optional[jax.Array] = None
    ) -> jax.Array:
        """Denoising score-matching loss (diffusion.py:240-256)."""
        return losses_lib.denoising_score_matching(
            self.score, self.sde, key, x, conditional
        )

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------
    def _reverse_drift_fn(self, conditional):
        """Reverse-SDE drift f - g^2 s as a (t, x) closure — fused kernel
        (c0 x + 2 c1 net) when available, plain XLA otherwise.  Shared by
        ``sample_sde`` and ``sample_pc``."""
        if self._fused_available():
            from ..kernels.fused_mlp import fused_drift

            def drift(t, x):
                c0, c1 = self._fused_coeffs(t)
                return fused_drift(
                    self.params, self.net, t, x, conditional,
                    c0=c0, c1=2.0 * c1,
                    compute_dtype=self.kernel_compute_dtype,
                )

        else:

            def drift(t, x):
                g = self.sde.diffusion(t, x)
                return self.sde.drift(t, x) - g**2 * self.score(
                    t, x, conditional
                )

        return drift

    def sample_sde(
        self,
        key: jax.Array,
        shape: Tuple[int, ...],
        conditional: Optional[jax.Array] = None,
        steps: int = 100,
        progress: bool = False,
    ) -> EMResult:
        """Reverse-time Euler--Maruyama sampler (diffusion.py:510-563).

        Returns an ``EMResult``; ``.x_mean`` is the reference's return value
        (final denoised mean).  The NaN guard is the ``nan_encountered``
        flag instead of a printed warning; ``progress=True`` restores the
        reference's per-step tqdm bar (host callback — off for speed).

        Eager multi-device calls split the batch over all devices
        (``parallel.autoshard``; each shard draws from its own fold of
        ``key``).
        """
        from ..parallel import autoshard

        if not progress and autoshard.should_route(key, conditional, self.params):
            (x_mean, x), _ = autoshard.routed_sample(
                _sample_sde_per_shard,
                lambda local: (local, tuple(shape[1:]), steps),
                self,
                key,
                shape[0],
                conditional,
            )
            # flag from the RETURNED rows only: surplus padding rows on the
            # last shard can NaN without affecting any visible sample
            nan = ~(
                jnp.all(jnp.isfinite(x_mean)) & jnp.all(jnp.isfinite(x))
            )
            return EMResult(x_mean=x_mean, x=x, nan_encountered=nan)

        k_prior, k_path = jax.random.split(key)
        x0 = self.sde.prior_sample(k_prior, shape)
        drift = self._reverse_drift_fn(conditional)

        return euler_maruyama(
            k_path,
            drift,
            self.sde.diffusion,
            x0,
            t0=self.sde.T,
            t1=self.sde.epsilon,
            steps=steps,
            epsilon=self.sde.epsilon,
            progress=progress,
        )

    def sample_dpm(
        self,
        base_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        steps: int = 12,
        order: int = 2,
    ) -> jax.Array:
        """Fast deterministic sampling with DPM-Solver (beyond-reference).

        Exponential integrator on the uniform log-SNR grid
        (ops/integrate/dpm.py): matches probability-flow dopri5 samples to
        solver accuracy in an order of magnitude fewer network
        evaluations (order 2: 2*steps evals vs dopri5's ~6 per accepted
        step).  ``base_samples`` ~ N(0,1), as in ``sample_ode_from_base``.
        """
        from ..ops.integrate.dpm import dpm_solver_sample
        from ..parallel import autoshard

        if autoshard.should_route(base_samples, conditional, self.params):
            (out,), _ = autoshard.routed_call(
                _sample_dpm_per_shard,
                (steps, order),
                self,
                base_samples,
                conditional,
                None,
            )
            return out

        x_T = base_samples * self.sde.prior_scale

        if self._fused_available():
            from ..kernels.fused_mlp import fused_drift

            def eps_fn(t, x):
                # dpm passes a constant (B,) time vector; the kernel folds
                # a SCALAR solver time into the first-layer bias
                ts = jnp.reshape(t, (-1,))[0]
                eta = self.sde.marginal_prob_scalars(ts)[1]
                c1 = -eta if self.no_sigma else -eta / self.sde.sigma(ts)
                # eps = -eta * score = c1 * net: forward-mode fused_drift
                # with (c0, c1) = (0, c1)
                return fused_drift(
                    self.params, self.net, ts, x, conditional,
                    c0=0.0, c1=c1,
                    compute_dtype=self.kernel_compute_dtype,
                )

        else:

            def eps_fn(t, x):
                # noise prediction: eps = -eta(t) * score
                eta = self.sde.marginal_prob_scalars(t)[1]
                eta = jnp.reshape(eta, (-1,) + (1,) * (x.ndim - 1))
                return -eta * self.score(t, x, conditional)

        return dpm_solver_sample(
            eps_fn, self.sde, x_T, steps=steps, order=order,
            t_start=float(self.sde.T), t_end=float(self.sde.epsilon),
        )

    def sample_pc(
        self,
        key: jax.Array,
        shape: Tuple[int, ...],
        conditional: Optional[jax.Array] = None,
        steps: int = 100,
        corrector_steps: int = 1,
        snr: float = 0.16,
    ) -> EMResult:
        """Predictor--corrector sampler (Song et al. 2021, beyond-reference).

        Each of the ``steps`` reverse-time levels runs one Euler--Maruyama
        predictor step (identical to ``sample_sde``) followed by
        ``corrector_steps`` annealed-Langevin corrector steps at the new
        noise level with the paper's SNR-controlled step size
        ``eps = 2 (snr ||z|| / ||score||)^2`` (batch-mean norms; the
        discrete-time ``alpha_t`` prefactor is 1 in the continuous-time
        limit used here).  The
        corrector re-equilibrates the marginal at each level, improving
        sample quality at coarse step counts.  ``corrector_steps=0``
        reduces exactly to ``sample_sde``'s update rule.  Runs under
        ``lax.scan``; uses the fused kernel for both the predictor drift
        and the corrector score when available.
        """
        k_prior, k_path = jax.random.split(key)
        x0 = self.sde.prior_sample(k_prior, shape)
        T = float(self.sde.T)
        eps_t = float(self.sde.epsilon)
        dt = -(T - eps_t) / steps
        rev_drift = self._reverse_drift_fn(conditional)

        if self._fused_available():
            from ..kernels.fused_mlp import fused_drift

            def score_fn(t, x):
                inv_sigma = (
                    1.0
                    if self.no_sigma
                    else 1.0 / self.sde.sigma(jnp.asarray(t, jnp.float32))
                )
                return fused_drift(
                    self.params, self.net, t, x, conditional,
                    c0=0.0, c1=inv_sigma,
                    compute_dtype=self.kernel_compute_dtype,
                )

        else:

            def score_fn(t, x):
                return self.score(t, x, conditional)

        def batch_mean_norm(v):
            return jnp.mean(
                jnp.linalg.norm(v.reshape(v.shape[0], -1), axis=-1)
            )

        def body(carry, inp):
            x_old, xm_old, frozen = carry
            t, k = inp
            kp, kc = jax.random.split(k)
            # predictor: one reverse-SDE EM step t -> t + dt
            g = self.sde.diffusion(t, x_old)
            x_mean = x_old + rev_drift(t, x_old) * dt
            z = jax.random.normal(kp, x_old.shape, x_old.dtype)
            x = x_mean + g * jnp.sqrt(-dt) * z
            # corrector: Langevin at the new level
            t_next = jnp.maximum(t + dt, eps_t)
            for _ in range(corrector_steps):
                kc, kz = jax.random.split(kc)
                grad = score_fn(t_next, x)
                z = jax.random.normal(kz, x.shape, x.dtype)
                step = 2.0 * (
                    snr
                    * batch_mean_norm(z)
                    / jnp.maximum(batch_mean_norm(grad), 1e-20)
                ) ** 2
                x_mean = x + step * grad
                x = x_mean + jnp.sqrt(2.0 * step) * z
            # NaN guard with sample_sde's freeze semantics: keep the last
            # finite state instead of letting the NaN poison later steps.
            bad = frozen | ~jnp.all(jnp.isfinite(x))
            x = jnp.where(bad, x_old, x)
            x_mean = jnp.where(bad, xm_old, x_mean)
            return (x, x_mean, bad), None

        ts = T + dt * jnp.arange(steps, dtype=jnp.float32)
        keys = jax.random.split(k_path, steps)
        (x, x_mean, nan), _ = jax.lax.scan(
            body, (x0, x0, jnp.asarray(False)), (ts, keys)
        )
        return EMResult(x_mean=x_mean, x=x, nan_encountered=nan)

    def sample_sde_fused(
        self,
        key: jax.Array,
        shape: Tuple[int, ...],
        conditional: Optional[jax.Array] = None,
        steps: int = 100,
        compute_dtype: Optional[str] = None,
    ) -> EMResult:
        """Fully-fused EM sampler: the whole step loop in ONE Pallas kernel.

        Fastest sampling path: slope-timed on v5e (relay dispatch
        overhead cancelled — BENCHMARKS.md "timing methodology") it runs
        ~1.5x the ``sample_sde`` scan in strict f32 and ~4x in the bf16
        compute mode, whose matmul precision is dwarfed by the EM
        discretization's O(dt) error anyway.  State and
        activations never leave VMEM between steps; noise comes from the
        TPU hardware PRNG (seeded from ``key``), so draws differ from
        ``sample_sde``'s jax.random stream while the sampled *distribution*
        is identical.  Conditioning costs one precomputed first-layer
        contribution (step-independent) streamed per tile.
        """
        from ..kernels.em_sampler import fused_em_sample

        k_prior, k_seed = jax.random.split(key)
        x0 = self.sde.prior_sample(k_prior, shape)
        seed = jax.random.randint(k_seed, (), 0, 2**31 - 1, jnp.int32)
        x_mean, x, diverged = fused_em_sample(
            self.params,
            self.net,
            self.sde,
            x0,
            seed,
            conditional=conditional,
            steps=steps,
            no_sigma=self.no_sigma,
            compute_dtype=compute_dtype or self.kernel_compute_dtype,
        )
        # The kernel's NaN-freeze guarantees finite outputs, so divergence
        # is reported by its per-tile flag, not output finiteness (the
        # finiteness check additionally catches a non-finite prior draw,
        # which freezes at step 0 and propagates x0 through).
        nan = (
            diverged
            | ~(jnp.all(jnp.isfinite(x_mean)) & jnp.all(jnp.isfinite(x)))
        )
        return EMResult(x_mean=x_mean, x=x, nan_encountered=nan)

    def sample_ode_from_base(
        self,
        base_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        atol: float = 1e-4,
        rtol: float = 1e-4,
        method: str = "dopri5",
        options: Optional[dict] = None,
        adjoint: bool = False,
    ) -> Tuple[jax.Array, SolverStats]:
        """Deterministic sampling: integrate the prob-flow ODE 1.0 -> epsilon.

        ``base_samples`` ~ N(0, 1); they are scaled by the prior scale
        (sigma_max for VESDE) before the solve (diffusion.py:605-608).

        ``adjoint=True`` makes the solve differentiable w.r.t. the model
        parameters via the O(1)-memory continuous adjoint (the reference's
        ``odeint_adjoint`` training path, diffusion.py:620-629); stats are
        returned as None in that mode.

        Eager multi-device calls shard the batch over all devices
        (``parallel.autoshard``); stats then carry a leading n_devices
        axis.
        """
        from ..parallel import autoshard

        if not adjoint and autoshard.should_route(base_samples, conditional, self.params):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                samples, stats = autoshard.routed_call(
                    _sample_ode_per_shard,
                    (atol, rtol, method, opts),
                    self,
                    base_samples,
                    conditional,
                    None,
                )
                return samples, stats

        z = base_samples * self.sde.prior_scale

        if adjoint:
            from ..ops.integrate.adjoint import odeint_adjoint

            def func(t, x, params):
                m = dataclasses.replace(self, params=params)
                return m.ode_drift(t, x, conditional)

            ys = odeint_adjoint(
                func,
                z,
                [1.0, float(self.sde.epsilon)],
                self.params,
                rtol=rtol,
                atol=atol,
                method=method,
                options=options,
            )
            return jax.tree_util.tree_map(lambda a: a[-1], ys), None

        if self._fused_available():
            from ..kernels.fused_mlp import fused_drift

            def rhs(t, x):
                c0, c1 = self._fused_coeffs(t)
                return fused_drift(
                    self.params, self.net, t, x, conditional, c0=c0, c1=c1,
                    compute_dtype=self.kernel_compute_dtype,
                )

        else:

            def rhs(t, x):
                return self.ode_drift(t, x, conditional)

        ys, stats = odeint(
            rhs,
            z,
            [1.0, float(self.sde.epsilon)],
            rtol=rtol,
            atol=atol,
            method=method,
            options=options,
        )
        return jax.tree_util.tree_map(lambda a: a[-1], ys), stats

    # ------------------------------------------------------------------
    # likelihood
    # ------------------------------------------------------------------
    def _make_probes(self, key: Optional[jax.Array], x: jax.Array):
        """Sample trace probes once per solve (diffusion.py:697-721)."""
        return trace_lib.make_probes(
            self.trace_mode, key, x,
            hpp_rank=self.hpp_rank, hpp_vecs=self.hpp_vecs, xt_vecs=self.xt_vecs,
        )

    def solve_odes_forward(
        self,
        x0_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        method: str = "dopri5",
        options: Optional[dict] = None,
        adjoint: bool = False,
    ) -> Tuple[jax.Array, jax.Array, SolverStats]:
        """Integrate (x, dlogp) from t=epsilon to t=1 (diffusion.py:642-754).

        Returns (x_T, delta_logp, stats) with delta_logp of shape (B,).
        ``adjoint=True`` gives parameter gradients through the solve
        (stats None).

        Eager multi-device calls route per shard like ``log_prob``
        (``parallel.autoshard``) — this is the reference-public surface
        (diffusion.py:642), so it must not raise on multi-chip realms
        where ``log_prob`` one frame up succeeds.
        """
        from ..parallel import autoshard

        if not adjoint and autoshard.should_route(
            x0_samples, conditional, key, self.params
        ):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                (xT, dlp), stats = autoshard.routed_call(
                    _solve_fwd_per_shard,
                    (atol, rtol, method, opts),
                    self,
                    x0_samples,
                    conditional,
                    key,
                )
                return xT, dlp, stats

        probes = self._make_probes(key, x0_samples)
        est = trace_lib.divergence_fn(self.trace_mode)

        if adjoint:
            if self.trace_mode == "xtrace":
                raise NotImplementedError(
                    "trace_mode='xtrace' has no gradient (its sketch is "
                    "fully stop-gradient'ed, see ops.trace.xtrace_divergence)"
                    " — use 'exact', 'hutchinson', or 'hutchpp' for "
                    "adjoint/training solves"
                )
            # The adjoint path differentiates through the RHS, so it always
            # uses the plain-XLA estimators (the Pallas kernels have no
            # autodiff rule).  NB the adjoint-mode exact-trace graph is
            # verified to compile and produce finite grads on this TPU
            # platform — the compiler crash that forces the fused kernel on
            # the no-grad path is specific to the forward-only exact graph.
            from ..ops.integrate.adjoint import odeint_adjoint

            def func(t, state, params):
                m = dataclasses.replace(self, params=params)
                x, _ = state

                def drift_of_x(xx):
                    return m.ode_drift(t, xx, conditional)

                return est(drift_of_x, x, *probes)

            dlp0 = jnp.zeros((x0_samples.shape[0],), x0_samples.dtype)
            ys = odeint_adjoint(
                func,
                (x0_samples, dlp0),
                [float(self.sde.epsilon), 1.0],
                self.params,
                rtol=rtol,
                atol=atol,
                method=method,
                options=options,
            )
            xs, dlps = ys
            return xs[-1], dlps[-1], None

        if self.trace_mode in ("hutchinson", "exact") and self._fused_available(
            for_exact=self.trace_mode == "exact"
        ):
            from ..kernels.fused_mlp import fused_drift

            def rhs(t, state):
                x, _ = state
                c0, c1 = self._fused_coeffs(t)
                x_dot, div = fused_drift(
                    self.params, self.net, t, x, conditional,
                    e=probes[0] if self.trace_mode == "hutchinson" else None,
                    exact_divergence=self.trace_mode == "exact",
                    c0=c0, c1=c1,
                    compute_dtype=self.kernel_compute_dtype,
                )
                return (x_dot, div)

        elif self.trace_mode in ("hutchpp", "xtrace") and self._fused_available():
            from ..kernels.fused_mlp import fused_drift_sketch

            # Whole estimator in one kernel dispatch: forward chain runs
            # once (stored-derivative reuse for the second Jacobian
            # application), per-sample QR + sketch algebra in-lane.
            # Probes fixed per solve like the reference's
            # (diffusion.py:700-721).
            def rhs(t, state):
                x, _ = state
                c0, c1 = self._fused_coeffs(t)
                x_dot, div = fused_drift_sketch(
                    self.params, self.net, t, x, probes, self.trace_mode,
                    conditional, c0=c0, c1=c1,
                    compute_dtype=self.kernel_compute_dtype,
                )
                return (x_dot, div)

        else:

            def rhs(t, state):
                x, _ = state

                def drift_of_x(xx):
                    return self.ode_drift(t, xx, conditional)

                x_dot, div = est(drift_of_x, x, *probes)
                return (x_dot, div)

        dlp0 = jnp.zeros((x0_samples.shape[0],), x0_samples.dtype)
        (xs, dlps), stats = odeint(
            rhs,
            (x0_samples, dlp0),
            [float(self.sde.epsilon), 1.0],
            rtol=rtol,
            atol=atol,
            method=method,
            options=options,
        )
        return xs[-1], dlps[-1], stats

    def log_prob_per_sample(
        self,
        x0_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        atol: float = 1e-4,
        rtol: float = 1e-4,
        method: str = "dopri5",
        options: Optional[dict] = None,
    ) -> Tuple[jax.Array, SolverStats]:
        """log_prob with per-sample adaptive stepping (fast mode).

        Each row gets its own dopri5 step sequence instead of the
        reference's batch-global stepping (ops.integrate.odeint_per_sample)
        — same estimator, different discretization error profile.  Returns
        (lp (B,), per-sample SolverStats).

        Eager multi-device calls shard the batch over all devices like
        ``log_prob`` (``parallel.autoshard``); stats stay (B,)-shaped
        (per row, not per shard — the mode is per-sample by definition).
        """
        from ..ops.integrate import odeint_per_sample
        from ..parallel import autoshard

        if self.trace_mode not in ("exact", "hutchinson"):
            raise NotImplementedError(
                "per-sample stepping supports trace_mode 'exact' and "
                "'hutchinson' (sketch-based estimators are batch-coupled)"
            )
        if autoshard.should_route(x0_samples, conditional, key, self.params):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                (lp, stats), _ = autoshard.routed_call(
                    _common.logprob_per_sample_per_shard,
                    (atol, rtol, method, opts),
                    self,
                    x0_samples,
                    conditional,
                    key,
                )
                return lp, stats
        if options is None:
            options = {"min_step": 1e-6}

        # Batch-shaped auxiliaries (probe, conditional) ride along in the
        # vmapped state with zero dynamics so each row's closure sees only
        # its own slice.
        probes = self._make_probes(key, x0_samples)
        e = probes[0] if probes else jnp.zeros_like(x0_samples)
        cond = (
            conditional
            if conditional is not None
            else jnp.zeros((x0_samples.shape[0], 0), x0_samples.dtype)
        )
        has_cond = conditional is not None

        def rhs_aug(t, state):
            x, _, e_, c_ = state
            c_in = c_ if has_cond else None
            f = lambda xx: self.ode_drift(t, xx, c_in)
            if self.trace_mode == "hutchinson":
                x_dot, div = trace_lib.hutchinson_divergence(f, x, e_)
            else:
                x_dot, div = trace_lib.exact_divergence(f, x)
            return (x_dot, div, jnp.zeros_like(e_), jnp.zeros_like(c_))

        dlp0 = jnp.zeros((x0_samples.shape[0],), x0_samples.dtype)
        (xs, dlps, _, _), stats = odeint_per_sample(
            rhs_aug,
            (x0_samples, dlp0, e, cond),
            [float(self.sde.epsilon), 1.0],
            rtol=rtol,
            atol=atol,
            method=method,
            options=options,
        )
        xT = xs[:, -1]
        dlp = dlps[:, -1]
        lp = dlp + jnp.sum(self.sde.prior_log_prob(xT), axis=1)
        return lp, stats

    def log_prob(
        self,
        x0_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        atol: float = 1e-4,
        rtol: float = 1e-4,
        method: str = "dopri5",
        options: Optional[dict] = None,
        adjoint: bool = False,
    ) -> Tuple[jax.Array, SolverStats]:
        """Exact CNF log-likelihood (diffusion.py:756-815).

        Defaults mirror the reference: atol=rtol=1e-4, min_step=1e-6.
        Returns (log_prob (B,), stats).

        On a multi-device realm, an *eager* call (concrete arrays, no
        enclosing jit) automatically shards the batch over all devices and
        runs the single-device program — fused kernels included — per
        shard (``parallel.autoshard``).  Stats then carry a leading
        n_devices axis (one solve per shard).  Calls under a user ``jit``
        are left to the user's own sharding.
        """
        from ..parallel import autoshard

        if not adjoint and autoshard.should_route(x0_samples, conditional, key, self.params):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                lp, stats = autoshard.routed_call(
                    _logprob_per_shard,
                    (atol, rtol, method, opts),
                    self,
                    x0_samples,
                    conditional,
                    key,
                )
                return lp, stats

        if options is None:
            from ..ops.integrate.tableaus import ADAPTIVE_TABLEAUS

            # the min_step guard is an adaptive-solver option; fixed-step
            # and multistep methods reject unknown options loudly
            options = (
                {"min_step": 1e-6} if method in ADAPTIVE_TABLEAUS else {}
            )
        xT, dlp, stats = self.solve_odes_forward(
            x0_samples,
            conditional=conditional,
            key=key,
            atol=atol,
            rtol=rtol,
            method=method,
            options=options,
            adjoint=adjoint,
        )
        lp = dlp + jnp.sum(self.sde.prior_log_prob(xT), axis=1)
        return lp, stats


def _solve_fwd_per_shard(atol, rtol, method, opts):
    """Per-shard solve_odes_forward body for ``parallel.autoshard``
    (module-level: its identity is the jit-cache key)."""

    def per_shard(model, xb, cb, kb):
        xT, dlp, stats = model._per_shard_variant().solve_odes_forward(
            xb,
            cb,
            key=kb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
        )
        return (xT, dlp), jax.tree_util.tree_map(
            lambda s: jnp.reshape(s, (1,)), stats
        )

    return per_shard


def _logprob_per_shard(atol, rtol, method, opts):
    """Per-shard log_prob body for ``parallel.autoshard`` (module-level:
    its identity is the jit-cache key)."""

    def per_shard(model, xb, cb, kb):
        lp, stats = model._per_shard_variant().log_prob(
            xb,
            cb,
            key=kb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
        )
        return lp, jax.tree_util.tree_map(lambda s: jnp.reshape(s, (1,)), stats)

    return per_shard


def _sample_ode_per_shard(atol, rtol, method, opts):
    """Per-shard sample_ode_from_base body for ``parallel.autoshard``."""

    def per_shard(model, zb, cb, kb):
        del kb
        samples, stats = model._per_shard_variant(exact=False).sample_ode_from_base(
            zb,
            cb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
        )
        return samples, jax.tree_util.tree_map(
            lambda s: jnp.reshape(s, (1,)), stats
        )

    return per_shard


def _sample_dpm_per_shard(steps, order):
    """Per-shard sample_dpm body for ``parallel.autoshard``
    (module-level: its identity is the jit-cache key)."""

    def per_shard(model, xb, cb, kb):
        out = model._per_shard_variant(exact=False).sample_dpm(
            xb, conditional=cb, steps=steps, order=order
        )
        return (out,), ()

    return per_shard


def _sample_sde_per_shard(local_rows, shape_rest, steps):
    """Per-shard sample_sde body for ``parallel.autoshard``."""

    def per_shard(model, cb, kb):
        res = model._per_shard_variant(exact=False).sample_sde(
            kb, (local_rows, *shape_rest), cb, steps=steps
        )
        return (res.x_mean, res.x), jnp.reshape(res.nan_encountered, (1,))

    return per_shard
