"""Population-model wrappers: standardization + convenience API.

TPU-native equivalents of ``PopulationModelDiffusion`` and
``PopulationModelDiffusionConditional``
(/root/reference/flowfusion/diffusion.py:1466-1848): thin pytree wrappers
around a ``ScoreModel`` that own shift/scale (and conditional shift/scale)
statistics and apply them at the API boundary.

Parity notes (including reference quirks, preserved and documented):
  * ``forward``/``sample`` uses atol=rtol=1e-5 regardless of construction
    options (hard-coded in the reference, diffusion.py:1579-1580);
  * ``log_prob`` does NOT subtract sum(log(scale)) — densities are reported
    in *standardized* units, unlike the flow/symplectic wrappers which do
    apply the volume correction (SURVEY.md §2.6.5).  Pass
    ``volume_corrected=True`` to get the mathematically-consistent density
    in data units (a capability the reference lacks);
  * the reference's ``sample_sde`` ignores its ``steps`` argument and always
    runs 100 steps (bug at diffusion.py:1608); here ``steps`` works, with
    the same default of 100.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.integrate import SolverStats
from ..ops.sde import SDE
from .nets import ScoreMLPConfig, init_score_mlp
from . import _common
from .score import ScoreModel

__all__ = ["PopulationModelDiffusion"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PopulationModelDiffusion:
    """Standardizing wrapper over a ScoreModel (conditional when
    ``conditional_shift``/``conditional_scale`` are set).

    One class covers both reference wrappers; an unconditional model simply
    has no conditional statistics (the reference's conditional wrapper also
    forgot to expose the Hutchinson flag, diffusion.py:1678-1689 — here
    ``trace_mode`` is uniformly available through the inner ScoreModel).
    """

    score_model: ScoreModel
    shift: jax.Array
    scale: jax.Array
    conditional_shift: Optional[jax.Array]
    conditional_scale: Optional[jax.Array]

    @classmethod
    def create(
        cls,
        key: jax.Array,
        sde: SDE,
        n_dimensions: int = 2,
        n_conditionals: int = 0,
        embedding_dimensions: int = 8,
        units: Tuple[int, ...] = (128,),
        activation: str = "silu",
        shift=None,
        scale=None,
        conditional_shift=None,
        conditional_scale=None,
        no_sigma: bool = False,
        trace_mode: str = "exact",
        hpp_rank: int = 1,
        hpp_vecs: int = 1,
        xt_vecs: int = 1,
        use_fused_kernel: Optional[bool] = None,
        kernel_compute_dtype: str = "float32",
    ) -> "PopulationModelDiffusion":
        """Build the wrapper + its inner ScoreModel in one call (net init,
        standardization stats, SDE, trace estimator, kernel knobs)."""
        net = ScoreMLPConfig(
            n_dimensions=n_dimensions,
            n_conditionals=n_conditionals,
            embedding_dimensions=embedding_dimensions,
            units=tuple(units),
            activation=activation,
        )
        params = init_score_mlp(key, net)
        sm = ScoreModel(
            params=params,
            net=net,
            sde=sde,
            no_sigma=no_sigma,
            trace_mode=trace_mode,
            hpp_rank=hpp_rank,
            hpp_vecs=hpp_vecs,
            xt_vecs=xt_vecs,
            use_fused_kernel=use_fused_kernel,
            kernel_compute_dtype=kernel_compute_dtype,
        )
        d_shift, d_scale = _common.std_stats(n_dimensions, shift, scale)
        c_shift, c_scale = _common.cond_stats(
            n_conditionals, conditional_shift, conditional_scale
        )
        return cls(
            score_model=sm,
            shift=d_shift,
            scale=d_scale,
            conditional_shift=c_shift,
            conditional_scale=c_scale,
        )

    # ------------------------------------------------------------------
    def _norm_cond(self, conditional):
        return _common.norm_cond(
            conditional, self.conditional_shift, self.conditional_scale
        )

    def loss_fn(self, key, x, conditional=None):
        """DSM loss on standardized data — the training entry point."""
        x_std = (x - self.shift) / self.scale
        return self.score_model.loss_fn(key, x_std, self._norm_cond(conditional))

    def forward(
        self,
        base_samples: jax.Array,
        conditional: Optional[jax.Array] = None,
        method: str = "dopri5",
        options: Optional[dict] = None,
        adjoint: bool = False,
    ) -> Tuple[jax.Array, SolverStats]:
        """Deterministic sampling via the prob-flow ODE (diffusion.py:1556-1585).

        atol=rtol=1e-5 hard-coded, matching the reference.  ``adjoint=True``
        makes the solve differentiable w.r.t. the wrapper's parameters via
        the O(1)-memory continuous adjoint — the reference's training-mode
        ``odeint_adjoint`` switch inside the wrapper (diffusion.py:1575-1585);
        stats are None in that mode (they are not differentiable).
        """
        x0, stats = self.score_model.sample_ode_from_base(
            base_samples,
            conditional=self._norm_cond(conditional),
            atol=1e-5,
            rtol=1e-5,
            method=method,
            options=options,
            adjoint=adjoint,
        )
        return x0 * self.scale + self.shift, stats

    # alias matching the nn.Module calling convention
    sample = forward

    def sample_sde(
        self,
        key: jax.Array,
        shape: Tuple[int, ...],
        conditional: Optional[jax.Array] = None,
        steps: int = 100,
    ) -> jax.Array:
        """Stochastic sampling via reverse-SDE Euler--Maruyama.

        Note: unlike the reference (which hard-codes 100 steps and silently
        ignores ``steps``, diffusion.py:1608), ``steps`` is honoured here.
        """
        res = self.score_model.sample_sde(
            key, shape, conditional=self._norm_cond(conditional), steps=steps
        )
        # surface the NaN guard like the reference's printed warning
        # (diffusion.py:561): the wrapper API returns samples only, so an
        # eager diverged solve warns instead of silently returning the
        # frozen state.  Under a trace the flag is a tracer — skip.
        flag = res.nan_encountered
        if not isinstance(flag, jax.core.Tracer) and bool(flag):
            import warnings

            warnings.warn(
                "sample_sde: diffusion diverged (NaN encountered); returning "
                "the last finite state — reduce step size or check training"
            )
        return res.x_mean * self.scale + self.shift

    def log_prob(
        self,
        x: jax.Array,
        conditional: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        method: str = "dopri5",
        options: Optional[dict] = None,
        volume_corrected: bool = False,
        adjoint: bool = False,
    ) -> Tuple[jax.Array, SolverStats]:
        """Log density (diffusion.py:1587-1640).  Shape (B,).

        ``adjoint=True`` makes the returned log-probs differentiable w.r.t.
        the wrapper (parameters and statistics) via the continuous adjoint,
        mirroring the reference's training-mode ``odeint_adjoint`` dispatch
        at the wrapper layer (diffusion.py:620, 733).

        By default reports densities of the *standardized* variables — the
        reference omits the -sum(log scale) Jacobian of the affine
        standardization (SURVEY.md §2.6.5).  ``volume_corrected=True`` adds
        it, yielding a proper density in data units.
        """
        # Delegates to ScoreModel.log_prob on standardized inputs.  The
        # wrapper contract stays atol=rtol=1e-5 with NO min_step guard
        # (SURVEY.md §6): options={} (not None) suppresses ScoreModel's
        # own min_step default, the same idiom as log_prob_per_sample.
        # Standardizing FIRST also means a trace over the wrapper's
        # shift/scale makes x_std a tracer, so routing correctly stays
        # out of user jits over the statistics; routing itself (incl. the
        # per-shard fused-kernel opt-in) is ScoreModel.log_prob's.
        lp, stats = self.score_model.log_prob(
            (x - self.shift) / self.scale,
            conditional=self._norm_cond(conditional),
            key=key,
            atol=atol,
            rtol=rtol,
            method=method,
            options={} if options is None else options,
            adjoint=adjoint,
        )
        if volume_corrected:
            lp = lp - jnp.sum(jnp.log(self.scale))
        return lp, stats

    def log_prob_per_sample(
        self,
        x: jax.Array,
        conditional: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        method: str = "dopri5",
        options: Optional[dict] = None,
        volume_corrected: bool = False,
    ) -> Tuple[jax.Array, SolverStats]:
        """Wrapper-level per-sample fast mode (beyond-reference).

        Standardizes like ``log_prob`` and delegates to
        ``ScoreModel.log_prob_per_sample`` (each row steps at its own
        pace); same standardized-units default and ``volume_corrected``
        switch.  Returns (lp (B,), per-sample SolverStats).
        """
        # {} (not None) preserves the wrapper contract of NO min_step
        # guard (see log_prob above): ScoreModel.log_prob_per_sample
        # would otherwise default options=None to {'min_step': 1e-6}.
        lp, stats = self.score_model.log_prob_per_sample(
            (x - self.shift) / self.scale,
            conditional=self._norm_cond(conditional),
            key=key,
            atol=atol,
            rtol=rtol,
            method=method,
            options={} if options is None else options,
        )
        if volume_corrected:
            lp = lp - jnp.sum(jnp.log(self.scale))
        return lp, stats

