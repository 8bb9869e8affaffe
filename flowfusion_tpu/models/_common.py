"""Shared plumbing for the model families (dispatch policy, standardization).

The three model classes (ScoreModel, ODEFlow, SymplecticFlowModel) share the
same fused-kernel auto-dispatch rule and the same standardization-statistics
defaulting in their ``create`` constructors; previously each re-stated it and
the copies had started to diverge.  One definition here, consumed by all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import math

import jax
import jax.numpy as jnp

__all__ = [
    "auto_fused", "fused_dispatch", "per_shard_variant",
    "std_stats", "cond_stats", "norm_cond",
]


def auto_fused(use_fused_kernel: Optional[bool], supported: bool) -> bool:
    """The shared fused-kernel dispatch policy.

    Explicit True/False wins (gated on ``supported``).  Auto (None) enables
    the kernel only on a single-device TPU jit: under multi-chip jit
    auto-sharding the GSPMD partitioner cannot partition a ``pallas_call``
    (multi-chip deployments run the kernel per shard via
    ``parallel.sharding.data_parallel_per_shard`` with
    ``use_fused_kernel=True``), and off-TPU the interpreter is slower than
    plain XLA.
    """
    if use_fused_kernel is not None:
        if use_fused_kernel and not supported:
            raise ValueError(
                "use_fused_kernel=True but this solve is outside the "
                "fused kernel's support envelope: the net must be a stock "
                "config (arbitrary hidden widths ride the pad-to-lanes "
                "transform; activation silu/tanh/relu/gelu) with feature "
                "count D + C <= 64, or <= 16 for exact-trace solves — "
                "fix the config, switch trace_mode to a stochastic "
                "estimator, or drop the flag"
            )
        return bool(use_fused_kernel)
    return (
        supported
        and jax.default_backend() == "tpu"
        and len(jax.devices()) == 1
    )


def fused_dispatch(
    use_fused_kernel: Optional[bool],
    supported: bool,
    for_exact: bool = False,
    what: str = "exact-trace solves",
) -> bool:
    """:func:`auto_fused` plus the exact-trace TPU guard, shared by
    ScoreModel and ODEFlow.

    On TPU the pure-XLA exact-trace graphs (diffusion and flow alike)
    crash this platform's compiler (TpuPriorityFusionQueue SIGILL) at
    large batches, so exact solves must ride the fused basis-tangent
    kernel there.  Under AUTO, ``for_exact`` therefore never silently
    builds the plain exact graph on TPU — regardless of batch size,
    since the crash threshold is batch- and fusion-dependent:

    * multi-device jit auto-sharding (GSPMD cannot partition a
      ``pallas_call``): raises, pointing at
      ``parallel.data_parallel_per_shard``;
    * a net config outside the fused envelope (a custom net object, or
      feature count D + C > 16 for exact trace — arbitrary hidden
      widths and all stock activations are *inside* it via the
      pad-to-lanes transform, kernels/fused_mlp.py): raises, pointing
      at the stochastic estimators.

    Explicit ``use_fused_kernel=True`` with an unsupported config raises
    (never a silent fallback); explicit ``False`` forces the plain graph
    for users whose XLA build compiles it.
    """
    if use_fused_kernel is not None:
        # shares auto_fused's loud explicit-True-but-unsupported raise
        return auto_fused(use_fused_kernel, supported)
    auto = auto_fused(None, supported)
    if for_exact and not auto and jax.default_backend() == "tpu":
        if not supported:
            raise ValueError(
                f"{what} on TPU: this net is outside the fused kernel's "
                "envelope (a custom net object, or feature count D + C > "
                "16 for exact trace), and the plain-XLA exact-trace graph "
                "crashes this platform's compiler at large batches "
                "(BENCHMARKS.md, crash families). Switch to "
                "trace_mode='hutchinson' (or another estimator), or set "
                "use_fused_kernel=False explicitly to force the plain "
                "graph if your XLA build compiles it"
            )
        raise ValueError(
            f"{what} on multi-device TPU must run the fused kernel per "
            "shard: wrap the solve in parallel.data_parallel_per_shard "
            "with use_fused_kernel=True (or set use_fused_kernel=False "
            "explicitly to force the plain-XLA graph if your XLA build "
            "compiles it)"
        )
    return auto


def per_shard_variant(model, supported: bool):
    """The model each device runs under auto-sharding (shard_map) — the
    shared force-fused-on-TPU rule for all three families.

    Inside shard_map every device executes a single-device program, so on
    TPU the fused kernel is both safe and (for the score/flow exact-trace
    graphs) required — the plain-XLA conditional-RHS graph family crashes
    this platform's compiler.  :func:`auto_fused` cannot see that from
    ``jax.devices()`` alone (it counts the realm, not the shard), hence
    the explicit opt-in here.  Off-TPU, or when the caller's envelope
    check says the config is unsupported, the auto policy stands.

    ``supported`` is the caller's per-solve envelope answer
    (``_fused_supported(...)``) — each family owns that check; this
    helper owns only the dispatch rule, so the rule cannot diverge
    between families again.
    """
    if (
        model.use_fused_kernel is None
        and jax.default_backend() == "tpu"
        and supported
    ):
        return dataclasses.replace(model, use_fused_kernel=True)
    return model


# Python-level constant: module import must stay device-free (a jnp.log
# at import time would initialize a jax backend before the caller can
# pick one).  Shared by the flow/symplectic log-densities (ops/sde.py
# keeps its own copy — ops must not import models).
_LOG_2PI = math.log(2.0 * math.pi)


def std_normal_logpdf(x):
    """Elementwise log N(x | 0, 1)."""
    return -0.5 * x**2 - 0.5 * _LOG_2PI


def std_stats(
    dim: int, shift, scale
) -> Tuple[jax.Array, jax.Array]:
    """Standardization buffers with reference defaults (shift 0, scale 1)."""
    z = jnp.zeros((dim,), jnp.float32)
    o = jnp.ones((dim,), jnp.float32)
    return (
        jnp.asarray(shift, jnp.float32) if shift is not None else z,
        jnp.asarray(scale, jnp.float32) if scale is not None else o,
    )


def cond_stats(
    n_conditionals: int, shift, scale
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """Conditional standardization buffers; (None, None) when unconditional."""
    if not n_conditionals:
        if shift is not None or scale is not None:
            raise ValueError(
                "conditional shift/scale supplied but n_conditionals=0 — "
                "did you forget to set the conditional dimension?"
            )
        return None, None
    return std_stats(n_conditionals, shift, scale)


def norm_cond(conditional, shift, scale):
    """Standardize a conditional batch; passes None through."""
    if conditional is None:
        return None
    if shift is None or scale is None:
        raise ValueError(
            "a conditional was passed but this model has no conditional "
            "statistics (built with n_conditionals=0?)"
        )
    return (conditional - shift) / scale


def logprob_per_sample_per_shard(atol, rtol, method, opts):
    """Shared per-shard ``log_prob_per_sample`` body for
    ``parallel.autoshard`` (module-level: its identity is the jit-cache
    key).  Used by ScoreModel and ODEFlow, whose fast modes share the
    ``(x, conditional, key=...)`` signature; both outputs are row-shaped,
    so everything rides in the batch pytree.  No ``_per_shard_variant``:
    the per-sample path runs plain per-row closures (the fused kernels
    are batch-tiled, not per-row)."""

    def per_shard(model, xb, cb, kb):
        lp, stats = model.log_prob_per_sample(
            xb,
            cb,
            key=kb,
            atol=atol,
            rtol=rtol,
            method=method,
            options=dict(opts) if opts is not None else None,
        )
        return (lp, stats), ()

    return per_shard
