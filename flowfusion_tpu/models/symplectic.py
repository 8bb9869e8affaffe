"""Symplectic (Hamiltonian) generative flow with trace-free log-likelihood.

TPU-native redesign of the reference ``SymplecticFlowModel``
(/root/reference/flowfusion/symplectic.py:125-253).  The dynamics come from
a separable-Hamiltonian network (``ops.nets.apply_symplectic_mlp``) whose
joint (q, p) field is exactly divergence-free, so the change-of-variables
log-density needs *no* Jacobian integral: volume preservation gives
log p_data(q0) = log N(z1) - log N(p0) - sum(log scale), with one auxiliary
momentum sample p0 marginalized by a single draw (a stochastic lower-bound
estimator; reference comment symplectic.py:245-249).

Parity notes:
  * ``sample`` is fixed-step Euler t: 1 -> 0 with ``num_steps`` default 1 —
    the "one network eval per sample" fast sampler (symplectic.py:165-201);
  * ``log_prob`` integrates t: 0 -> 1 with dopri5 at atol=rtol=1e-5
    (symplectic.py:237).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import _common
from ..ops.integrate import SolverStats, odeint, odeint_fixed
from .nets import SymplecticMLPConfig, init_symplectic_mlp

__all__ = ["SymplecticFlowModel"]

from ._common import _LOG_2PI, std_normal_logpdf as _std_normal_logpdf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymplecticFlowModel:
    params: dict
    shift: jax.Array
    scale: jax.Array
    conditional_shift: Optional[jax.Array]
    conditional_scale: Optional[jax.Array]
    net: SymplecticMLPConfig = dataclasses.field(metadata=dict(static=True))
    # Fused Pallas velocity kernel (kernels/fused_mlp.
    # fused_symplectic_velocity): None = auto on single-device TPU for
    # supported configs; used in the no-grad solve paths (sample Euler loop
    # and the trace-free log_prob ODE), never in loss_fn (the kernel has no
    # autodiff rule).
    use_fused_kernel: Optional[bool] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    kernel_compute_dtype: str = dataclasses.field(
        default="float32", metadata=dict(static=True)
    )

    def _fused_supported(self) -> bool:
        from ..kernels.fused_mlp import fusable_config, supports_features

        return (
            isinstance(self.net, SymplecticMLPConfig)
            # fusable = supported or liftable by pad_to_lanes (the kernel
            # entry points pad transparently)
            and fusable_config(self.net.units, self.net.activation)
            # forward-only velocity kernel: the wide-feature (MXU
            # input-projection) envelope applies — no exact-trace bound
            # (symplectic log-prob is trace-free)
            and supports_features(
                self.net.n_data_dims + self.net.n_conditionals
            )
        )

    def _fused_available(self) -> bool:
        return _common.auto_fused(self.use_fused_kernel, self._fused_supported())

    def _per_shard_variant(self) -> "SymplecticFlowModel":
        """Model each device runs under auto-sharding (the shared
        ``_common.per_shard_variant`` rule; the symplectic envelope is
        forward-only — its log-prob is trace-free)."""
        return _common.per_shard_variant(self, self._fused_supported())

    def _solve_dynamics(self, conditional):
        """RHS for the no-grad solve paths: fused kernel when available."""
        if self._fused_available():
            from ..kernels.fused_mlp import fused_symplectic_velocity

            return lambda t, s: fused_symplectic_velocity(
                self.params, self.net, t, s, conditional,
                compute_dtype=self.kernel_compute_dtype,
            )
        return lambda t, s: self.dynamics(t, s, conditional)

    @classmethod
    def create(
        cls,
        key: jax.Array,
        n_data_dims: int = 2,
        n_conditionals: int = 0,
        embedding_dimensions: int = 8,
        units: Tuple[int, ...] = (128,),
        activation: str = "silu",
        shift=None,
        scale=None,
        conditional_shift=None,
        conditional_scale=None,
        use_fused_kernel: Optional[bool] = None,
        kernel_compute_dtype: str = "float32",
    ) -> "SymplecticFlowModel":
        """Build a fresh SymplecticFlowModel with an initialized q/p net pair."""
        net = SymplecticMLPConfig(
            n_data_dims=n_data_dims,
            n_conditionals=n_conditionals,
            embedding_dimensions=embedding_dimensions,
            units=tuple(units),
            activation=activation,
        )
        params = init_symplectic_mlp(key, net)
        d_shift, d_scale = _common.std_stats(n_data_dims, shift, scale)
        c_shift, c_scale = _common.cond_stats(
            n_conditionals, conditional_shift, conditional_scale
        )
        return cls(
            params=params,
            shift=d_shift,
            scale=d_scale,
            conditional_shift=c_shift,
            conditional_scale=c_scale,
            net=net,
            use_fused_kernel=use_fused_kernel,
            kernel_compute_dtype=kernel_compute_dtype,
        )

    # ------------------------------------------------------------------
    def _norm_cond(self, conditional):
        return _common.norm_cond(
            conditional, self.conditional_shift, self.conditional_scale
        )

    def dynamics(
        self, t: jax.Array, state: jax.Array, conditional: Optional[jax.Array] = None
    ) -> jax.Array:
        """Divergence-free joint field [dq/dt, dp/dt] on *standardized* cond."""
        return self.net.apply(self.params, t, state, conditional)

    def loss_fn(
        self, key: jax.Array, x: jax.Array, conditional: Optional[jax.Array] = None
    ) -> jax.Array:
        """Flow-matching loss on the joint (q, p) state.

        The reference trains this model in its demo with an FM objective on
        the joint state; the library itself ships no loss for it — this is
        the natural choice (linear interpolant between data-q plus N(0,1)
        noise-p at t=0 and joint N(0,1) at t=1).
        """
        from ..ops.losses import flow_matching_loss

        kq, k_fm = jax.random.split(key)
        q0 = (x - self.shift) / self.scale
        p0 = jax.random.normal(kq, q0.shape, q0.dtype)
        s0 = jnp.concatenate([q0, p0], axis=-1)
        return flow_matching_loss(
            self.dynamics, k_fm, s0, self._norm_cond(conditional)
        )

    # ------------------------------------------------------------------
    def sample(
        self,
        key: jax.Array,
        shape: Tuple[int, int],
        conditional: Optional[jax.Array] = None,
        num_steps: int = 1,
        method: str = "euler",
        base: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Sampler t: 1 -> 0, default ONE Euler step (symplectic.py:165-201).

        ``shape`` = (batch, n_data_dims); noise is drawn jointly for (q, p).
        ``base`` (batch, 2*n_data_dims) overrides the joint noise draw
        (``key`` is then unused) — for deterministic replay and the AOT
        serving artifacts (``utils.serving.export_sampler``).

        ``method='leapfrog'`` uses Stormer--Verlet instead (capability the
        reference lacks): second-order and exactly volume-preserving, so
        coarse-step sampling stays consistent with the trace-free log-prob
        identity.  Needs num_steps >= 1; at num_steps=1 it costs 3 half
        evaluations vs Euler's 1 full one.

        Eager multi-device calls split the batch over all devices
        (``parallel.autoshard``; each shard draws from its own fold of
        ``key``).  ``base`` pins the noise and skips routing.
        """
        from ..parallel import autoshard

        if base is None and autoshard.should_route(key, conditional, self.params):
            samples, _ = autoshard.routed_sample(
                _sympl_sample_per_shard,
                lambda local: (local, shape[1], num_steps, method),
                self,
                key,
                shape[0],
                conditional,
            )
            return samples

        batch, d = shape
        if num_steps < 1:
            raise ValueError(f"num_steps must be >= 1, got {num_steps}")
        if base is not None:
            x = base
        else:
            x = jax.random.normal(key, (batch, 2 * d), jnp.float32)
        cond = self._norm_cond(conditional)

        if method == "leapfrog":
            from ..ops.integrate.fixed import leapfrog
            from .nets import (
                apply_symplectic_p_velocity,
                apply_symplectic_q_velocity,
            )

            q1, p1 = jnp.split(x, 2, axis=-1)

            # single-stack forces: each kick needs only one of the two
            # separable-Hamiltonian nets (the joint apply would run both
            # and discard half — 2x the necessary FLOPs per evaluation)
            def vq(t, p):
                return apply_symplectic_q_velocity(
                    self.net, self.params, t, p, cond
                )

            def vp(t, q):
                return apply_symplectic_p_velocity(
                    self.net, self.params, t, q, cond
                )

            q0, _ = leapfrog(vq, vp, q1, p1, t0=1.0, t1=0.0, steps=num_steps)
        else:
            ys = odeint_fixed(
                self._solve_dynamics(cond),
                x,
                [1.0, 0.0],
                method=method,
                steps_per_interval=num_steps,
            )
            q0 = jnp.split(ys[-1], 2, axis=-1)[0]
        return q0 * self.scale + self.shift

    def log_prob(
        self,
        key: jax.Array,
        x: jax.Array,
        conditional: Optional[jax.Array] = None,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        method: str = "dopri5",
        options: Optional[dict] = None,
        adjoint: bool = False,
        n_momentum_samples: int = 1,
    ) -> Tuple[jax.Array, SolverStats]:
        """Trace-free log-likelihood (symplectic.py:203-253).

        ``key`` draws the auxiliary momentum p0 ~ N(0,1).  Returns (lp (B,),
        stats).  ``adjoint=True`` differentiates through the solve via the
        O(1)-memory adjoint ODE (stats None) — capability the reference
        lacks for this model; the default path (fused kernel or plain
        while_loop solver) is forward-only.

        ``n_momentum_samples`` (K) tightens the reference's single-draw
        bound IWAE-style (beyond-reference): the marginal
        p(q0) = E_{p0~N}[N(z1)/N(p0)] is estimated with K draws and
        combined as logsumexp - log K — unbiased in probability space,
        and the log-space bound tightens monotonically in K.  Costs one
        joint solve at K x batch rows (rows are independent, so the
        batch-parallel solve absorbs it).
        """
        K = int(n_momentum_samples)
        if K < 1:
            raise ValueError("n_momentum_samples must be >= 1")

        from ..parallel import autoshard

        if not adjoint and autoshard.should_route(x, conditional, key, self.params):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                return autoshard.routed_call(
                    _sympl_logprob_per_shard,
                    (atol, rtol, method, opts, K),
                    self,
                    x,
                    conditional,
                    key,
                )

        q0 = (x - self.shift) / self.scale
        cond = self._norm_cond(conditional)
        if K > 1:
            q0 = jnp.tile(q0, (K, 1))
            if cond is not None:
                cond = jnp.tile(cond, (K, 1))
        p0 = jax.random.normal(key, q0.shape, q0.dtype)
        state0 = jnp.concatenate([q0, p0], axis=-1)

        if adjoint:
            from ..ops.integrate.adjoint import odeint_adjoint

            def func(t, s, params):
                m = dataclasses.replace(self, params=params)
                return m.dynamics(t, s, cond)

            ys = odeint_adjoint(
                func, state0, [0.0, 1.0], self.params,
                rtol=rtol, atol=atol, method=method, options=options,
            )
            z1 = ys[-1]
            stats = None
        else:
            ys, stats = odeint(
                self._solve_dynamics(cond),
                state0,
                [0.0, 1.0],
                rtol=rtol,
                atol=atol,
                method=method,
                options=options,
            )
            z1 = ys[-1]
        log_p_z1 = jnp.sum(_std_normal_logpdf(z1), axis=-1)
        log_p_p0 = jnp.sum(_std_normal_logpdf(p0), axis=-1)
        lp = log_p_z1 - log_p_p0
        if K > 1:
            lp = jax.scipy.special.logsumexp(
                lp.reshape(K, x.shape[0]), axis=0
            ) - jnp.log(float(K))
        return lp - jnp.sum(jnp.log(self.scale)), stats


    def log_prob_per_sample(
        self,
        key: jax.Array,
        x: jax.Array,
        conditional: Optional[jax.Array] = None,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        method: str = "dopri5",
        options: Optional[dict] = None,
    ) -> Tuple[jax.Array, SolverStats]:
        """log_prob with per-sample adaptive stepping (fast mode).

        Each row gets its own dopri5 step sequence instead of the
        reference's batch-global stepping — the symplectic twin of
        ``ScoreModel.log_prob_per_sample`` / ``ODEFlow.log_prob_per_sample``
        (the reference, symplectic.py:203-253, has only batch-global).
        Trace-free, so the per-row state is just the joint (q, p) vector
        plus the zero-dynamics conditional.  Returns (lp (B,), per-sample
        SolverStats).

        Eager multi-device calls shard the batch over all devices
        (``parallel.autoshard``); stats stay (B,)-shaped.
        """
        from ..ops.integrate import odeint_per_sample
        from ..parallel import autoshard

        if autoshard.should_route(x, conditional, key, self.params):
            opts = autoshard.hashable_options(options)
            if opts is not autoshard.UNROUTABLE:
                (lp, stats), _ = autoshard.routed_call(
                    _sympl_logprob_per_sample_per_shard,
                    (atol, rtol, method, opts),
                    self,
                    x,
                    conditional,
                    key,
                )
                return lp, stats

        q0 = (x - self.shift) / self.scale
        cond_n = self._norm_cond(conditional)
        p0 = jax.random.normal(key, q0.shape, q0.dtype)
        state0 = jnp.concatenate([q0, p0], axis=-1)
        cond = (
            cond_n
            if cond_n is not None
            else jnp.zeros((x.shape[0], 0), x.dtype)
        )
        has_cond = cond_n is not None

        def rhs_aug(t, state):
            s, c_ = state
            c_in = c_ if has_cond else None
            return (self.dynamics(t, s, c_in), jnp.zeros_like(c_))

        (ss, _), stats = odeint_per_sample(
            rhs_aug,
            (state0, cond),
            [0.0, 1.0],
            rtol=rtol,
            atol=atol,
            method=method,
            options=options,
        )
        z1 = ss[:, -1]
        lp = jnp.sum(_std_normal_logpdf(z1), axis=-1) - jnp.sum(
            _std_normal_logpdf(p0), axis=-1
        )
        return lp - jnp.sum(jnp.log(self.scale)), stats


def _sympl_sample_per_shard(local_rows, d, num_steps, method):
    """Per-shard sample body for ``parallel.autoshard``."""

    def per_shard(model, cb, kb):
        q0 = model._per_shard_variant().sample(
            kb, (local_rows, d), conditional=cb,
            num_steps=num_steps, method=method,
        )
        return q0, ()

    return per_shard


def _sympl_logprob_per_sample_per_shard(atol, rtol, method, opts):
    """Per-shard log_prob_per_sample body for ``parallel.autoshard``
    (module-level: its identity is the jit-cache key)."""

    def per_shard(model, xb, cb, kb):
        lp, stats = model.log_prob_per_sample(
            kb,
            xb,
            conditional=cb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
        )
        return (lp, stats), ()

    return per_shard


def _sympl_logprob_per_shard(atol, rtol, method, opts, K):
    """Per-shard symplectic log_prob body for ``parallel.autoshard``
    (module-level: its identity is the jit-cache key)."""

    def per_shard(model, xb, cb, kb):
        lp, stats = model._per_shard_variant().log_prob(
            kb,
            xb,
            conditional=cb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
            n_momentum_samples=K,
        )
        return lp, jax.tree_util.tree_map(lambda s: jnp.reshape(s, (1,)), stats)

    return per_shard
