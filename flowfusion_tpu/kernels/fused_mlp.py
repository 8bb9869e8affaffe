"""Pallas TPU kernel: fused score-MLP drift (+ Hutchinson tangent) evaluation.

The hot op of every ODE solve is the probability-flow RHS: one score-net
forward (and, for likelihoods, a JVP for the divergence estimate).  Under
plain XLA each linear layer round-trips its (B, H) activations through HBM
for large B; this kernel keeps the whole layer chain — and the tangent
chain — in VMEM per batch tile, so HBM traffic is just x/e in and
drift/div out.  All weights live in VMEM (a few hundred KB).

Key structural trick: during a solve the time ``t`` is a *batch-global
scalar* (the solver steps the batch as one system), so the Fourier time
embedding contributes a t-dependent *bias* to the first layer:
  in = [temb | x | cond]  =>  a1 = x W1_x + cond W1_c + (b1 + temb W1_e).
The host computes ``b1_eff = b1 + temb @ W1_e`` per RHS call (an (E,H)
matvec — negligible) and the kernel never touches the embedding rows, so
no feature-padding games are needed: the dominant matmuls are the
lane-aligned (T,H)x(H,H) hidden layers on the MXU.

The Hutchinson tangent is propagated analytically in the same kernel:
linear layers map tangents through the same weights; SiLU multiplies by
silu'(a) = sigmoid(a) (1 + a (1 - sigmoid(a))).  For a fixed probe ``e``
this yields exactly J_net e, so  div = e . (J e)  matches the JVP-based
estimator bit-for-bit up to matmul precision.

The SDE enters through two scalars (all three SDE families have affine
probability-flow drift in the net output):
  drift = c0 * x + c1 * net(t, x[, cond])          (c1 folds g^2/2 and 1/sigma)
  div   = c0 * D + c1 * (e . J_net e)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_drift",
    "fused_drift_reference",
    "fused_drift_sketch",
    "fused_drift_tangents",
    "fused_symplectic_velocity",
    "fused_velocity",
    "fused_velocity_sketch",
    "fused_velocity_tangents",
    "pad_to_lanes",
    "paddable_config",
    "fusable_config",
    "supports_config",
    "supports_features",
]


def _round_up(n, m):
    return ((n + m - 1) // m) * m


_KERNEL_ACTIVATIONS = ("silu", "tanh", "relu", "gelu")

# Input-projection strategy crossover: up to this many feature rows the
# kernel accumulates rank-1 VPU outer products (no relayout, no wasted
# systolic load for D ~ 2-16); beyond it, one (H, K) @ (K, subtile) MXU
# pass is cheaper (K rank-1 VPU adds scale linearly; the padded matmul
# is one pass regardless).
_RANK1_MAX = 16

# Widest feature count (D + C) the fused envelope admits for the
# forward/Hutchinson/sketch modes.  Bounded by the probe/IO block VMEM
# clamp in _dispatch, not by projection cost; raise only with a
# measured VMEM plan.  Exact-trace stays at _RANK1_MAX: its cost is
# d_out full tangent chains, so past ~16 features a stochastic
# estimator is the right tool (the crossover the reference's own docs
# describe — see BENCHMARKS.md "Scaling in the data dimension").
MAX_FUSED_FEATURES = 64


def supports_config(units: Sequence[int], activation: str = "silu") -> bool:
    """Kernel supports uniform lane-multiple hidden widths and the
    activations whose value/derivative pairs it implements."""
    return (
        len(units) >= 1
        and all(u == units[0] for u in units)
        and units[0] % 128 == 0
        and activation in _KERNEL_ACTIVATIONS
    )


def paddable_config(units: Sequence[int], activation: str = "silu") -> bool:
    """True when :func:`pad_to_lanes` can lift the config into the support
    envelope: arbitrary hidden widths, but an activation the kernel
    implements.  Every kernel activation satisfies act(0) == 0, which is
    what makes zero-padding exact (see ``pad_to_lanes``)."""
    return len(units) >= 1 and activation in _KERNEL_ACTIVATIONS


def fusable_config(units: Sequence[int], activation: str = "silu") -> bool:
    """Config half of the fused envelope, padding included — what the
    model-level dispatch predicates consult (``supports_config`` remains
    the as-is envelope the kernels compile directly)."""
    return supports_config(units, activation) or paddable_config(
        units, activation
    )


def pad_to_lanes(params: dict, cfg):
    """Zero-pad hidden widths to one uniform lane multiple: (params', cfg').

    Lifts any :func:`paddable_config` net (e.g. ``units=(100, 100)`` — the
    family whose plain-XLA exact-trace graph SIGILLs this platform's
    compiler, BENCHMARKS.md "crash families") into the kernel envelope
    with EXACT semantics: every kernel activation has act(0) == 0, so a
    padded hidden unit has zero pre-activation (its weight column and
    bias entry are zero), zero activation, zero activation-derivative
    tangent (its incoming tangent contribution is zero), and contributes
    nothing downstream (the next layer multiplies it by anything times
    zero).  Forward, divergence, and tangent chains are therefore
    unchanged up to float-add-of-zero, which is exact.

    Handles the three stock families by their stack keys: ``layers``
    (score/velocity) and ``q_layers``/``p_layers`` (symplectic).  The
    returned config mirrors the input dataclass with its width field
    (``units`` or ``hidden_units``) replaced.  No-op (same objects) when
    the config is already supported.
    """
    import dataclasses as _dc

    units = getattr(cfg, "units", None)
    field = "units"
    if units is None:
        units = cfg.hidden_units
        field = "hidden_units"
    if supports_config(units, cfg.activation):
        return params, cfg
    if not paddable_config(units, cfg.activation):
        raise ValueError(
            f"fused kernel cannot pad units={units} "
            f"activation={cfg.activation!r} into its envelope (activation "
            f"must be one of {_KERNEL_ACTIVATIONS})"
        )
    H = max(_round_up(u, 128) for u in units)

    def pad_stack(layers):
        k = len(layers)
        out = []
        for i, lyr in enumerate(layers):
            w, b = lyr["w"], lyr["b"]
            pad_in = (H - w.shape[0]) if i > 0 else 0
            pad_out = (H - w.shape[1]) if i < k - 1 else 0
            out.append({
                "w": jnp.pad(w, ((0, pad_in), (0, pad_out))),
                "b": jnp.pad(b, ((0, pad_out),)),
            })
        return out

    padded = {
        k: (pad_stack(v) if k in ("layers", "q_layers", "p_layers") else v)
        for k, v in params.items()
    }
    return padded, _dc.replace(cfg, **{field: (H,) * len(units)})


def supports_features(n_features: int, exact: bool = False) -> bool:
    """Feature-count half of the fused support envelope.

    ``n_features`` is the model's D + C.  ``exact=True`` applies the
    tighter exact-trace bound (d_out tangent chains scale with D; the
    wide-input MXU projection only helps the other modes)."""
    return n_features <= (_RANK1_MAX if exact else MAX_FUSED_FEATURES)


def _compute_mode(compute_dtype: str):
    """(operand dtype, matmul precision) for a kernel compute mode.

    'float32'  — f32 operands, Precision.HIGHEST (bf16x6 passes on the
                 MXU): the reference parity mode.  The drift/forward chain
                 and exact-trace basis chains always run HIGHEST; the
                 sketch estimators' (Hutch++/XTrace) probe-tangent chains
                 run the 3-pass split-dot (see the tangent-chain precision
                 split in ``_kernel`` — a trace estimate's probe variance
                 dwarfs the ~2e-6 matmul deviation).
    'highf32'  — f32 operands, manual 3-pass bf16 split-dot ("bf16x3"):
                 each operand is split into a bf16 leading half and a
                 bf16 residual, and the three significant cross products
                 are accumulated in f32 (the a_lo*b_lo term, ~2^-18
                 relative, is dropped).  This emulates Precision.HIGH —
                 which Mosaic does not accept inside Pallas — at half the
                 MXU passes of HIGHEST; measured RHS deviation vs the
                 HIGHEST path is ~2e-6 relative, below the rtol=1e-5
                 solve's truncation floor (BENCHMARKS.md).
    'bfloat16' — bf16 operands at full MXU rate (~1e-3 accuracy).
    """
    s = str(compute_dtype)
    if s == "highf32":
        return jnp.dtype(jnp.float32), "bf16_3pass"
    cd = jnp.dtype(s)
    return cd, (
        jax.lax.Precision.HIGHEST
        if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _bf16_split(v):
    """bf16 leading half + bf16 residual of an f32 operand."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def bf16_3pass_dot_general(a, b, dims):
    """Manual 3-pass bf16 split-dot with f32 accumulation (the 'highf32'
    mode): a = a_hi + a_lo, b = b_hi + b_lo (bf16 halves); the three
    significant cross products run on the MXU and the ~2^-18-relative
    lo*lo term is dropped.  Identical operands recur across unrolled
    layer chains; MLIR CSE dedups their splits.  The single source of
    this algorithm — the RHS kernels ([_kernel]) and the training-epoch
    kernel (fused_train._make_dots) must not diverge in 'highf32'
    semantics.
    """
    dn = (dims, ((), ()))
    a_hi, a_lo = _bf16_split(a)
    b_hi, b_lo = _bf16_split(b)
    d = jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=jnp.float32)
    d = d + jax.lax.dot_general(
        a_hi, b_lo, dn, preferred_element_type=jnp.float32
    )
    return d + jax.lax.dot_general(
        a_lo, b_hi, dn, preferred_element_type=jnp.float32
    )


def _check_conditional(n_cond: int, conditional) -> None:
    """Refuse a config/argument conditional mismatch loudly.

    The plain-XLA apply fails with a matmul shape error on a missing
    conditional; the kernel wrappers slice the conditional weight rows
    explicitly and would otherwise silently compute net(t, x, cond=0).
    """
    if n_cond and conditional is None:
        raise ValueError(
            f"model expects {n_cond} conditional feature(s) but "
            "conditional=None was given"
        )
    if not n_cond and conditional is not None:
        raise ValueError("conditional given to an unconditional model")
    if conditional is not None and conditional.shape[-1] != n_cond:
        raise ValueError(
            f"conditional has {conditional.shape[-1]} feature(s); the model "
            f"expects {n_cond}"
        )


def _act_pair_fn(activation: str, fast_sigmoid: bool = False):
    """(act(a), act'(a)) for the activations the kernel chains support.

    One transcendental per layer, shared by the forward activation and
    every tangent chain's derivative factor.

    ``fast_sigmoid`` computes sigmoid through the exact identity
    sigmoid(a) = 0.5 + 0.5 tanh(a/2): Mosaic's tanh is markedly cheaper
    than its exp on the VPU (measured -16% on the whole 1M-row
    Hutchinson RHS eval), at ~8e-6 relative deviation from the
    exp-based form (the identity is exact; the delta is the two
    primitives' approximation error).  Used by the throughput compute
    modes ('highf32', 'bfloat16'); the strict 'float32' parity mode
    keeps the exp-based sigmoid, bit-matching plain XLA."""
    if activation == "silu":

        if fast_sigmoid:

            def pair(a):
                s = 0.5 + 0.5 * jnp.tanh(0.5 * a)
                return a * s, s * (1.0 + a * (1.0 - s))

            return pair

        def pair(a):
            s = jax.nn.sigmoid(a)
            return a * s, s * (1.0 + a * (1.0 - s))

    elif activation == "tanh":

        def pair(a):
            h = jnp.tanh(a)
            return h, 1.0 - h * h

    elif activation == "relu":

        def pair(a):
            m = (a > 0).astype(jnp.float32)
            return a * m, m

    elif activation == "gelu":
        # exact (erf) form, matching models/nets.py and torch.nn.GELU's
        # default: gelu(a) = a Phi(a), gelu'(a) = Phi(a) + a phi(a)
        inv_sqrt2 = 0.7071067811865476
        inv_sqrt2pi = 0.3989422804014327

        def pair(a):
            phi_cdf = 0.5 * (1.0 + jax.lax.erf(a * inv_sqrt2))
            pdf = inv_sqrt2pi * jnp.exp(-0.5 * a * a)
            return a * phi_cdf, phi_cdf + a * pdf

    else:  # pragma: no cover - guarded by supports_config
        raise ValueError(f"fused kernel does not implement {activation!r}")
    return pair


def in_proj_rows(mm_fn, w_in_ref, xc, n, d_total):
    """Input projection ``w_inT[:, :n] @ xc[:n]`` -> (H, cols) — the single
    source of the rank-1/MXU crossover for every kernel with a V4
    first layer (the RHS kernels here and the EM sampler).

    Up to ``_RANK1_MAX`` rows: rank-1 VPU accumulation over natural
    (1, cols) row slices — no relayout, and an n-row MXU pass would waste
    a systolic load at n ~ 2-16.  Beyond that the n rank-1 adds cost more
    than ONE padded (H, n) @ (n, cols) MXU pass (the wide-feature
    envelope, ``supports_features``) through ``mm_fn``.  ``d_total`` is
    the ref's full feature width: when ``n == d_total`` the whole-ref
    load ``w_in_ref[:]`` avoids a strided column slice."""
    if n > _RANK1_MAX:
        return mm_fn(w_in_ref[:, :n] if n < d_total else w_in_ref[:], xc[:n, :])
    acc = w_in_ref[:, 0][:, None] * xc[0:1, :]
    for j in range(1, n):
        acc = acc + w_in_ref[:, j][:, None] * xc[j : j + 1, :]
    return acc


def _act_value_fn(activation: str, fast_sigmoid: bool = False):
    """act(a) only — for forward-only kernels (e.g. the EM sampler),
    which would otherwise materialize the derivative half of
    ``_act_pair_fn`` and rely on DCE to strip it.  ``fast_sigmoid`` as
    in ``_act_pair_fn``."""
    if activation == "silu":
        if fast_sigmoid:
            return lambda a: a * (0.5 + 0.5 * jnp.tanh(0.5 * a))
        return lambda a: a * jax.nn.sigmoid(a)
    if activation == "tanh":
        return jnp.tanh
    if activation == "relu":
        return lambda a: a * (a > 0).astype(jnp.float32)
    if activation == "gelu":
        # exact erf form (see _act_pair_fn)
        inv_sqrt2 = 0.7071067811865476
        return lambda a: a * 0.5 * (1.0 + jax.lax.erf(a * inv_sqrt2))
    raise ValueError(  # pragma: no cover - guarded by supports_config
        f"fused kernel does not implement {activation!r}"
    )


def _exact_tile(d_out: int) -> int:
    """VMEM-budgeted tile for the exact-trace mode: 1 forward + d_out
    basis-tangent chains of live activations (shared by fused_drift and
    fused_velocity so the budget can be retuned in one place)."""
    return max(256, (3072 // (1 + d_out)) // 256 * 256)


def _score_first_layer(params, cfg, t, conditional):
    """Score-net first-layer fold shared by every fused_drift* wrapper.

    Returns ``(w_in, b_eff)``: the scalar solver time's Fourier embedding
    absorbed into the bias (torch input order [temb|x|cond]) and the
    [x|cond] weight rows concatenated for the kernel's in_proj."""
    from ..models.nets import fourier_time_embedding

    E = cfg.embedding_dimensions
    D = cfg.n_dimensions
    layers = params["layers"]
    t = jnp.asarray(t, jnp.float32).reshape(())
    temb = fourier_time_embedding(t[None], params["W"])[0]
    w1 = layers[0]["w"]
    b_eff = layers[0]["b"] + temb @ w1[:E]
    w_in = w1[E : E + D]
    if conditional is not None:
        w_in = jnp.concatenate([w_in, w1[E + D :]], axis=0)
    return w_in, b_eff


def _velocity_first_layer(params, cfg, t, conditional):
    """Velocity-net first-layer fold shared by every fused_velocity*
    wrapper (input order [x|t|cond]; t is a raw scalar feature)."""
    D = cfg.target_dimension
    layers = params["layers"]
    t = jnp.asarray(t, jnp.float32).reshape(())
    w1 = layers[0]["w"]
    b_eff = layers[0]["b"] + t * w1[D]
    w_in = w1[:D]
    if conditional is not None:
        w_in = jnp.concatenate([w_in, w1[D + 1 :]], axis=0)
    return w_in, b_eff


def _stack_sketch_probes(probes, sketch_mode, D):
    """Validate and feature-stack sketch probes: (V, n_tan, n_tan2).

    Mirrors the host path's guards (ops/trace): the QR can orthonormalize
    at most D columns, and Hutch++ divides by the residual-probe count.
    Silent failure modes otherwise: 0 residual probes -> 0/0 = NaN
    divergence; >D sketch columns -> rounding-noise 'basis'.
    """
    if sketch_mode == "hutchpp":
        S, G = probes
        if G.shape[0] < 1:
            raise ValueError(
                "hutchpp needs at least one residual probe (G); got 0 "
                "(the trace estimate divides by the residual count)"
            )
        if S.shape[0] > D:
            raise ValueError(
                f"hutchpp sketch rank {S.shape[0]} > D={D}: at most D "
                "orthonormal columns exist — reduce hpp_rank"
            )
        return jnp.concatenate([S, G], axis=0), S.shape[0], G.shape[0]
    if sketch_mode == "xtrace":
        (O,) = probes
        if not 1 <= O.shape[0] <= D:
            raise ValueError(
                f"xtrace needs 1 <= m <= D={D} probes; got {O.shape[0]}"
            )
        return O, O.shape[0], 0
    raise ValueError(f"unknown sketch mode {sketch_mode!r}")


def vmem_width_clamp(tile: int, H: int, chains: int) -> int:
    """Shrink-only batch-tile clamp so ``chains`` live (H, tile) f32
    arrays fit a ~12 MiB scoped-VMEM activation budget (Mosaic's stack
    limit is 16 MiB; calibrated 2026-08-20 when H=384 at the H=128-tuned
    tile kept ~18.3 MiB and refused to compile).  ONE copy of the
    formula — the EM sampler imports it too, so a budget recalibration
    lands everywhere.

    When even the minimum tile (256) exceeds the budget (chains * H >
    12288, e.g. exact trace with d_out=16 at H >= 896), raises a clear
    error instead of emitting a plan Mosaic will refuse to compile.
    """
    fit = (12 * 2**20 // (chains * H * 4)) // 256 * 256
    if fit < 256:
        raise ValueError(
            f"fused kernel VMEM plan does not fit: {chains} live chains of "
            f"width H={H} exceed the ~12 MiB scoped-VMEM budget even at "
            "the minimum batch tile (256). Reduce the chain count (e.g. "
            "trace_mode='hutchinson' instead of exact trace) or the "
            "hidden width; off-TPU backends can run the plain-XLA path "
            "with use_fused_kernel=False"
        )
    return min(tile, fit)


def _io_clamped_tile(tile: int, max_sub: int, io_rows_total: int) -> int:
    """Halve ``tile`` (floor 256) until the per-grid-step IO blocks —
    ``io_rows_total`` f32 rows of ``tile * max_sub`` columns — fit an
    ~8 MiB VMEM budget (double-buffered by Mosaic, so ~16 MiB peak of
    the ~128 MiB/core VMEM, leaving room for the activation chains)."""
    while tile > 256 and tile * max_sub * io_rows_total * 4 > 8 * 2**20:
        tile //= 2
    return tile


def _grid_plan(B: int, tile: int, max_sub: int = 16):
    """(tile, n_sub, padded_B): pack up to ``max_sub`` compute sub-tiles
    into each grid step (amortizes per-grid-step overhead) while keeping
    padding small."""
    tile = min(tile, B)
    n_tiles = -(-B // tile)
    grid_steps = -(-n_tiles // max_sub)
    n_sub = -(-n_tiles // grid_steps)
    padded = grid_steps * n_sub * tile
    return tile, n_sub, padded


def _kernel(n_hidden: int, mode: str, d_out: int, compute_dtype, n_sub, subtile, refs, n_tan: int = 0, activation: str = 'silu', n_tan2: int = 0, precision=None):
    """Kernel body.  Ref layout (all weights arrive pre-TRANSPOSED):
    [xT, (eT|vT), w_inT, b_eff, w_h1T.., b_h1.., w_outT, b_out, c0c1]
      -> [driftT, (div | jvT)]

    ``mode``: 'forward' (drift only), 'hutchinson' (one probe tangent
    chain), 'exact' (d_out basis tangent chains; the basis tangent
    through the input projection is just column d of w_inT, so the exact
    divergence costs d_out extra hidden chains and no probe input), or
    'tangents' (``n_tan`` arbitrary probe chains, stacked (n_tan*d_out,
    block) in vT; returns the full J v columns instead of a contraction —
    the building block for the Hutch++/XTrace sketch estimators, whose
    downstream algebra consumes exactly this feature-major layout), or
    'hutchpp' / 'xtrace' (the ENTIRE sketch estimator in one dispatch:
    forward chain with the per-layer activation derivatives kept live in
    VMEM, probe tangents, per-sample QR and the leave-one-out algebra all
    in the lane dimension, then the second Jacobian application *reusing*
    the stored derivative chain — no recomputed forward, no intermediate
    HBM round-trips, no second kernel launch.  'hutchpp' takes ``n_tan``
    sketch probes S and ``n_tan2`` residual probes G stacked row-wise in
    vT; 'xtrace' takes ``n_tan`` probes O).

    Layout (V4): the batch lives in the LANE dimension *through the whole
    chain* — x arrives as (D_in, block), every activation is (H, subtile),
    and drift leaves as (d_out, block).  Weights are pre-transposed so each
    hidden layer is the MXU-native ``(H, H) @ (H, subtile)`` and biases are
    (H, 1) lane-broadcasts.  V3 kept activations batch-major (subtile, H),
    which forced a lane->sublane relayout per input column and a cross-lane
    reduction per output column in every chunk; those VPU relayouts — not
    the MXU — dominated its 8.5 ns/row profile (bf16 matmuls changed
    nothing).  V4 has no relayouts at all.  Each grid step owns ``n_sub``
    sub-tiles of ``subtile`` columns and loops over them in-kernel,
    amortizing per-grid-step overhead.
    """
    with_tangent = mode == "hutchinson"
    with_div = mode != "forward"
    sketch = mode in ("hutchpp", "xtrace")
    i = 0
    x_ref = refs[i]; i += 1  # (D_in, block)
    e_ref = None
    if with_tangent or mode == "tangents" or sketch:
        e_ref = refs[i]; i += 1  # probe(s): (D_in, block) | (K*d_out, block)
    w_in = refs[i]; i += 1  # (H, D_in)  [transposed]
    b_eff = refs[i]; i += 1  # (H, 1)
    w_hidden = []
    b_hidden = []
    for _ in range(n_hidden - 1):
        w_hidden.append(refs[i]); i += 1  # (H, H) [transposed]
        b_hidden.append(refs[i]); i += 1  # (H, 1)
    w_out = refs[i]; i += 1  # (d_out, H)  [transposed]
    b_out = refs[i]; i += 1  # (d_out, 1)
    c_ref = refs[i]; i += 1  # SMEM (1, 2): c0, c1
    drift_ref = refs[i]; i += 1  # (d_out, block)
    div_ref = refs[i] if with_div else None  # (1, block)

    c0 = c_ref[0, 0]
    c1 = c_ref[0, 1]
    d_in = x_ref.shape[0]

    # Matmul operands are cast to compute_dtype (bf16 fast mode runs the
    # MXU at full rate; f32 'parity' mode keeps the 1e-5 density contract);
    # accumulation and all elementwise math stay f32.  NB: inside Pallas the
    # default dot precision is a single bf16 MXU pass even for f32 operands
    # (~1e-3 relative error — enough to inflate solver step counts); the
    # parity mode must request a multi-pass precision (``precision``, set
    # by the compute-mode table in ``_compute_mode``).
    prec = precision if precision is not None else (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm_3pass(w_, a_):
        return bf16_3pass_dot_general(w_, a_, ((1,), (0,)))

    if prec == "bf16_3pass":
        mm = mm_3pass
    else:

        def mm(w_, a_):
            return jnp.dot(
                w_,
                a_.astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    # Tangent-chain precision split (strict 'float32' mode only): the
    # SKETCH estimators' tangent chains run the 3-pass split-dot while
    # the drift chain keeps full HIGHEST.  A Hutch++/XTrace divergence is
    # a probe ESTIMATE with O(1) sampling variance, so the ~2e-6 relative
    # split-dot deviation is invisible next to both the estimator noise
    # and the fused-vs-plain contract (tests/test_kernels.py atol 2e-4) —
    # while the drift, the actual vector field, stays bit-comparable to
    # plain XLA HIGHEST.  Measured on the 50k-row likelihood suite:
    # Hutch++ 274k -> ~300k and XTrace 237k -> ~281k evals/s (each chain
    # saves 3 of 6 MXU passes, minus per-chain bf16-split VPU overhead —
    # the win needs >=3 tangent chains to clear that overhead, which is
    # why single-chain 'hutchinson' and d_out-chain 'exact' stay strict:
    # hutchinson measured a wash, and exact's selling point is
    # f32-exactness; the generic 'tangents' building block also stays
    # strict since its callers choose their own accuracy story).
    relax_tangents = (
        prec == jax.lax.Precision.HIGHEST
        and compute_dtype == jnp.float32
        and mode in ("hutchpp", "xtrace")
    )
    mm_tan = mm_3pass if relax_tangents else mm

    def in_proj(xc, nrows=None, matmul=None):
        """Input projection (see ``in_proj_rows`` for the rank-1/MXU
        crossover).  Probe tangents have zero conditional components, so
        their projection consumes only the first ``nrows`` (= d_out)
        weight columns — and passes ``matmul=mm_tan`` so a wide-input
        MXU projection honours the tangent-chain precision split like
        every other tangent matmul."""
        n = nrows if nrows is not None else d_in
        return in_proj_rows(matmul or mm, w_in, xc, n, d_in)

    # Throughput modes take the tanh-form sigmoid (see _act_pair_fn);
    # the strict f32 parity mode keeps exp, bit-matching plain XLA.
    act_pair = _act_pair_fn(
        activation,
        fast_sigmoid=(prec == "bf16_3pass" or compute_dtype == jnp.bfloat16),
    )

    def _qr_lane(cols):
        """MGS thin QR of per-sample (d_out, k) matrices held as k
        (d_out, subtile) lane-columns — the in-kernel mirror of
        ops/trace._qr_cols, INCLUDING the rank-deficient basis-completion
        fallback (degenerate columns — e.g. parallel Rademacher draws at
        D = 2 — are replaced by the largest-residual canonical basis
        vector orthogonalized against the accepted columns — the same
        construction as the host path, so fused and plain solves agree
        on degenerate sketches up to f32 rounding: the host maintains
        completion residuals incrementally while this kernel rebuilds
        them per column, so the last-ulp rounding can differ)."""
        k = len(cols)
        scale = jnp.sqrt(sum(jnp.sum(c * c, axis=0) for c in cols))
        floor = jnp.maximum(scale * 1e-6, 1e-30)
        zeros = jnp.zeros_like(scale)
        q_cols = []
        R = [[zeros for _ in range(k)] for _ in range(k)]
        for j in range(k):
            v = cols[j]
            for i2 in range(j):
                r_ij = jnp.sum(q_cols[i2] * v, axis=0)
                R[i2][j] = r_ij
                v = v - r_ij[None, :] * q_cols[i2]
            r_jj = jnp.sqrt(jnp.sum(v * v, axis=0))
            R[j][j] = r_jj

            # Basis completion: canonical e_c orthogonalized against the
            # accepted q's; pick the largest residual (running max —
            # branchless, unrolled over the static small d_out).
            best_norm = zeros
            best_res = jnp.zeros_like(v)
            row_idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            for c2 in range(d_out):
                res_c = (row_idx == c2).astype(v.dtype)  # e_c broadcast
                for i2 in range(j):
                    res_c = res_c - q_cols[i2][c2 : c2 + 1, :] * q_cols[i2]
                norm_c = jnp.sqrt(jnp.sum(res_c * res_c, axis=0))
                take = norm_c > best_norm
                best_norm = jnp.where(take, norm_c, best_norm)
                best_res = jnp.where(take[None, :], res_c, best_res)
            q_fb = best_res / jnp.maximum(best_norm, 1e-30)[None, :]
            degenerate = (r_jj < floor)[None, :]
            q_j = jnp.where(
                degenerate, q_fb, v / jnp.maximum(r_jj, floor)[None, :]
            )
            q_cols.append(q_j)
        return q_cols, R

    def _tri_inv_lane(R, k):
        """inv(upper-tri R) as (subtile,) entry grids — mirrors
        ops/trace._tri_inv_entries (same singular-diagonal clamp)."""
        scale = R[0][0] * 0
        for i2 in range(k):
            scale = jnp.maximum(scale, jnp.abs(R[i2][i2]))
        floor = jnp.maximum(scale * 1e-6, 1e-30)

        def safe_diag(i2):
            d = R[i2][i2]
            return jnp.where(
                jnp.abs(d) < floor, jnp.sign(d) * floor + (d == 0) * floor, d
            )

        zeros = jnp.zeros_like(scale)
        inv = [[zeros for _ in range(k)] for _ in range(k)]
        for j in range(k):
            for i2 in range(j, -1, -1):
                acc = jnp.full_like(scale, 1.0 if i2 == j else 0.0)
                for l2 in range(i2 + 1, j + 1):
                    acc = acc - R[i2][l2] * inv[l2][j]
                inv[i2][j] = acc / safe_diag(i2)
        return inv

    def _sketch_chunk(sl, xc):
        """One-dispatch Hutch++/XTrace: forward once (derivatives kept
        live), every Jacobian application reuses the stored chain."""
        # forward chain, retaining act'(a) per layer
        dh_list = []
        a = in_proj(xc) + b_eff[:]
        for li in range(n_hidden - 1):
            h, dh = act_pair(a)
            dh_list.append(dh)
            a = mm(w_hidden[li][:], h) + b_hidden[li][:]
        h, dh = act_pair(a)
        dh_list.append(dh)
        net = mm(w_out[:], h) + b_out[:]
        drift_ref[:, sl] = c0 * xc[:d_out, :] + c1 * net

        def apply_A(v):
            """A v = c0 v + c1 J_net v through the stored dh chain."""
            ta = in_proj(v, nrows=d_out, matmul=mm_tan)
            for li in range(n_hidden - 1):
                ta = mm_tan(w_hidden[li][:], dh_list[li] * ta)
            return c0 * v + c1 * mm_tan(w_out[:], dh_list[-1] * ta)

        def probe(k):
            return e_ref[k * d_out : (k + 1) * d_out, sl]

        if mode == "hutchpp":
            r, m = n_tan, n_tan2
            y_cols = [apply_A(probe(k)) for k in range(r)]
            q_cols, _ = _qr_lane(y_cols)
            u_cols = []
            for k in range(m):
                g = probe(r + k)
                u = g
                for q in q_cols:
                    u = u - jnp.sum(q * g, axis=0)[None, :] * q
                u_cols.append(u)
            aq = [apply_A(q) for q in q_cols]
            au = [apply_A(u) for u in u_cols]
            trace_lr = sum(jnp.sum(q * a_, axis=0) for q, a_ in zip(q_cols, aq))
            trace_res = sum(jnp.sum(u * a_, axis=0) for u, a_ in zip(u_cols, au))
            div_ref[0, sl] = trace_lr + trace_res / jnp.float32(m)
        else:  # xtrace — mirrors ops/trace.xtrace_core entry-grid algebra
            m = n_tan
            o_cols = [probe(k) for k in range(m)]
            y_cols = [apply_A(o) for o in o_cols]
            q_cols, R = _qr_lane(y_cols)
            aq_cols = [apply_A(q) for q in q_cols]

            H_ = [[jnp.sum(q_cols[i2] * aq_cols[j], axis=0) for j in range(m)]
                  for i2 in range(m)]
            W_ = [[jnp.sum(q_cols[i2] * o_cols[j], axis=0) for j in range(m)]
                  for i2 in range(m)]
            T_ = [[jnp.sum(aq_cols[i2] * o_cols[j], axis=0) for j in range(m)]
                  for i2 in range(m)]

            S_t = _tri_inv_lane(R, m)
            for i2 in range(m):
                norm = jnp.sqrt(sum(S_t[i2][j] * S_t[i2][j] for j in range(m)))
                norm = jnp.maximum(norm, 1e-30)
                S_t[i2] = [S_t[i2][j] / norm for j in range(m)]
            S_ = [[S_t[j][i2] for j in range(m)] for i2 in range(m)]

            trace_H = sum(H_[i2][i2] for i2 in range(m))
            csum = [sum(S_[i2][j] * W_[i2][j] for i2 in range(m)) for j in range(m)]
            X_ = [[W_[i2][j] - csum[j] * S_[i2][j] for j in range(m)]
                  for i2 in range(m)]

            def quad(V):
                HV = [
                    [sum(H_[i2][l2] * V[l2][j] for l2 in range(m)) for j in range(m)]
                    for i2 in range(m)
                ]
                return [sum(V[i2][j] * HV[i2][j] for i2 in range(m)) for j in range(m)]

            SHS = quad(S_)
            XHX = quad(X_)
            WS = [sum(W_[i2][j] * S_[i2][j] for i2 in range(m)) for j in range(m)]
            SR = [sum(S_[i2][j] * R[i2][j] for i2 in range(m)) for j in range(m)]
            TX = [sum(T_[i2][j] * X_[i2][j] for i2 in range(m)) for j in range(m)]
            ests = [trace_H - SHS[j] + WS[j] * SR[j] - TX[j] + XHX[j]
                    for j in range(m)]
            div_ref[0, sl] = sum(ests) / jnp.float32(m)

    def compute_chunk(ci, _):
        sl = pl.ds(ci * subtile, subtile)
        xc = x_ref[:, sl]  # (D_in, subtile) — natural slice, lanes = batch
        if sketch:
            _sketch_chunk(sl, xc)
            return 0
        a = in_proj(xc) + b_eff[:]  # (H, subtile)
        if with_tangent:
            # probe tangents have zero conditional components: e_ref
            # carries only d_out rows and projects through the x-weight
            # columns (no host-side zero-padding over the conditional)
            tangents = [in_proj(e_ref[:, sl], nrows=d_out, matmul=mm_tan)]
        elif mode == "tangents":
            tangents = [
                in_proj(
                    e_ref[k * d_out : (k + 1) * d_out, sl],
                    nrows=d_out,
                    matmul=mm_tan,
                )
                for k in range(n_tan)
            ]
        elif mode == "exact":
            # basis tangent e_d -> column d of w_inT, lane-broadcast
            tangents = [
                jnp.broadcast_to(
                    w_in[:, d][:, None].astype(jnp.float32), a.shape
                )
                for d in range(d_out)
            ]
        else:
            tangents = []

        # NB chain-MERGING (one (H, H) @ (H, (1+K)*subtile) MXU pass for
        # the forward + K tangent chains instead of 1+K separate calls)
        # was tried in round 4 and measured a WASH-to-regression in
        # interleaved same-window A/Bs on v5e (1M exact strict solve:
        # 762k/s merged vs 792k/s unmerged, reproducible; 50k: within
        # noise; K=1 Hutchinson: ~25% regression) — the per-layer lane
        # concat copies cost as much as the saved passes.  Keep the
        # simple per-chain matmuls; do not re-try without new evidence.
        for li in range(n_hidden - 1):
            h, dh = act_pair(a)
            # mm_tan == mm except in the relaxed strict-f32 stochastic
            # modes (see the tangent-chain precision split above)
            tangents = [mm_tan(w_hidden[li][:], dh * ta) for ta in tangents]
            a = mm(w_hidden[li][:], h) + b_hidden[li][:]

        h, dh = act_pair(a)

        # drift rows: c0 * x + c1 * (w_outT h + b_out), one (d_out, H) @
        # (H, subtile) MXU pass, written directly in output orientation.
        net = mm(w_out[:], h) + b_out[:]

        def tan_out(k):
            return mm_tan(w_out[:], dh * tangents[k])

        drift_ref[:, sl] = c0 * xc[:d_out, :] + c1 * net

        if with_tangent:
            je = tan_out(0)  # (d_out, subtile) = J e
            ec = e_ref[:d_out, sl]
            acc = jnp.sum(je * ec, axis=0)  # d_out-row reduce
            # e^T (c0 I + c1 J_net) e: the c0 term is c0 |e|^2 (equal to
            # c0 D only for Rademacher probes — plain-path parity for any
            # probe distribution, see ops/trace.hutchinson_divergence)
            div_ref[0, sl] = c0 * jnp.sum(ec * ec, axis=0) + c1 * acc
        elif mode == "tangents":
            for k in range(n_tan):
                vc = e_ref[k * d_out : (k + 1) * d_out, sl]
                jv = c0 * vc + c1 * tan_out(k)
                div_ref[k * d_out : (k + 1) * d_out, sl] = jv
        elif mode == "exact":
            acc = jnp.zeros((subtile,), jnp.float32)
            for d in range(d_out):
                # diagonal entry d: row d of chain d's output column
                acc = acc + tan_out(d)[d, :]
            div_ref[0, sl] = c0 * jnp.float32(d_out) + c1 * acc
        return 0

    jax.lax.fori_loop(0, n_sub, compute_chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_hidden", "mode", "d_out", "tile", "n_sub", "interpret",
        "compute_dtype", "n_tan", "activation", "n_tan2",
    ),
)
def _fused_drift_impl(
    x,
    e,
    w_in,
    b_eff,
    hidden_flat: Tuple[jax.Array, ...],
    w_out,
    b_out,
    c0c1,
    *,
    n_hidden: int,
    mode: str,
    d_out: int,
    tile: int,
    n_sub: int,
    interpret: bool,
    compute_dtype: str,
    n_tan: int = 0,
    activation: str = "silu",
    n_tan2: int = 0,
):
    with_tangent = mode == "hutchinson"
    with_div = mode != "forward"
    sketch = mode in ("hutchpp", "xtrace")
    D, B = x.shape  # transposed: feature rows, batch in lanes
    # V4 kernel orientation: weights transposed, biases as (H, 1) columns
    # (the transposes trace into the jitted graph once per compile; they
    # are tiny host-side reshuffles, not per-step work).
    w_in = w_in.T  # (H, D_in)
    b_eff = b_eff.T  # (H, 1)
    hidden_flat = tuple(a.T for a in hidden_flat)  # (H,H) w / (H,1) b
    w_out = w_out.T  # (d_out, H)
    b_out = b_out.T  # (d_out, 1)
    H = w_in.shape[0]
    block = tile * n_sub  # columns owned per grid step (B padded to this)
    grid = (B // block,)

    def batch_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    def weight_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [batch_spec(D)]
    operands = [x]
    if with_tangent:
        # probe rows = d_out (no conditional columns — see _dispatch)
        in_specs.append(batch_spec(d_out))
        operands.append(e)
    elif mode == "tangents" or sketch:
        in_specs.append(batch_spec((n_tan + n_tan2) * d_out))
        operands.append(e)
    in_specs += [weight_spec(w_in.shape), weight_spec(b_eff.shape)]
    operands += [w_in, b_eff]
    for arr in hidden_flat:
        in_specs.append(weight_spec(arr.shape))
        operands.append(arr)
    in_specs += [weight_spec(w_out.shape), weight_spec(b_out.shape)]
    operands += [w_out, b_out]
    in_specs.append(pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM))
    operands.append(c0c1)

    out_shape = [jax.ShapeDtypeStruct((d_out, B), jnp.float32)]
    out_specs = [batch_spec(d_out)]
    if mode == "tangents":
        out_shape.append(jax.ShapeDtypeStruct((n_tan * d_out, B), jnp.float32))
        out_specs.append(batch_spec(n_tan * d_out))
    elif with_div:
        out_shape.append(jax.ShapeDtypeStruct((1, B), jnp.float32))
        out_specs.append(batch_spec(1))

    cd, prec = _compute_mode(compute_dtype)
    kernel = lambda *refs: _kernel(
        n_hidden, mode, d_out, cd, n_sub, tile, refs, n_tan=n_tan,
        activation=activation, n_tan2=n_tan2, precision=prec,
    )
    if mode == "hutchpp":
        n_applies = 2 * n_tan + n_tan2  # A S, A Q, A U
    elif mode == "xtrace":
        n_applies = 2 * n_tan  # A O, A Q
    elif mode == "tangents":
        n_applies = n_tan
    elif mode == "exact":
        n_applies = d_out
    elif with_tangent:
        n_applies = 1
    else:
        n_applies = 0
    n_chains = 1 + n_applies
    flops_per_row = 2 * H * (D + (n_hidden - 1) * H + d_out) * n_chains
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=B * flops_per_row,
            bytes_accessed=B * (2 * D + 1) * 4,
            transcendentals=B * H * n_hidden,
        ),
        interpret=interpret,
    )(*operands)
    return result


def fused_drift(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
    e: Optional[jax.Array] = None,
    exact_divergence: bool = False,
    c0: jax.Array = 0.0,
    c1: jax.Array = 1.0,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Fused drift = c0*x + c1*net(t, x[, cond]) and optional divergence.

    Divergence modes: pass ``e`` for the Hutchinson estimate, or
    ``exact_divergence=True`` for the exact trace via d_out basis-tangent
    chains (no probe; d_out extra hidden chains of compute).

    ``tile`` default is VMEM-budgeted: the tangent path keeps roughly twice
    the live (tile, H) activations, so it gets half the tile.

    ``params``/``cfg`` are a ScoreMLP parameter pytree and config
    (models/nets.py).  ``t`` must be a scalar (batch-global solver time).
    Returns ``drift``, or ``(drift, div)`` in either divergence mode
    (probe ``e`` given OR ``exact_divergence=True``).

    The conditional, when present, is folded into the first layer like x
    (columns E+D..E+D+C of the torch-ordered input weight matrix).
    """
    if interpret is None:
        # Auto: compile on TPU, interpret elsewhere (tests / CPU meshes).
        interpret = jax.default_backend() != "tpu"

    D = cfg.n_dimensions
    if not supports_config(cfg.units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    layers = params["layers"]
    _check_conditional(cfg.n_conditionals, conditional)
    w_in, b_eff = _score_first_layer(params, cfg, t, conditional)

    if e is not None and exact_divergence:
        raise ValueError("pass a probe e OR exact_divergence, not both")
    mode = "hutchinson" if e is not None else ("exact" if exact_divergence else "forward")
    if tile is None and mode == "exact":
        tile = _exact_tile(D)
    elif tile is None and mode == "hutchinson":
        # Wider tangent tiles amortize per-grid-step overhead (measured
        # +4.5% on the 1M headline solve at 4096 vs 1024), but the x/e/
        # drift VMEM blocks scale with the input width — keep the big
        # tile for narrow inputs only.  3072 (not 4096) is the largest
        # tile whose STANDALONE dispatch also fits the 16 MB scoped-VMEM
        # budget at 50k-row batches (an eager fused_drift call jits the
        # kernel alone and its outputs land on the VMEM stack; inside a
        # compiled solver loop 4096 fit, but the eager path must not
        # OOM — it is what notebook users hit first).
        d_in = D + (0 if conditional is None else conditional.shape[-1])
        # Wider inputs keep proportionally larger x/e/drift blocks per
        # tile: 2048 measured +1.8% over 1024 on the 9-feature 1M
        # conditional solve and still fits standalone dispatch; 3072
        # VMEM-OOMs there even inside a compiled loop.
        tile = 3072 if d_in <= 4 else 2048
    return _dispatch(
        x, e, w_in, b_eff, layers, conditional, mode, D, c0, c1, tile,
        interpret, compute_dtype, activation=cfg.activation,
    )


def fused_drift_tangents(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    V: jax.Array,
    conditional: Optional[jax.Array] = None,
    c0: jax.Array = 0.0,
    c1: jax.Array = 1.0,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Fused drift + J V for a stack of arbitrary probe tangents.

    ``V``: (K, B, D) probes.  Returns ``(drift_cols, jv_cols)`` in the
    batch-in-lanes layout the sketch estimators consume: ``drift_cols``
    is (D, B) and ``jv_cols`` a list of K (D, B) columns of
    J v_k = c0 v_k + c1 J_net v_k (J taken w.r.t. x; conditional tangents
    are zero).  One kernel dispatch propagates all K tangent chains
    through the VMEM-resident layer chain alongside the forward pass.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.n_dimensions
    if not supports_config(cfg.units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    layers = params["layers"]
    _check_conditional(cfg.n_conditionals, conditional)
    w_in, b_eff = _score_first_layer(params, cfg, t, conditional)

    K = len(V) if isinstance(V, (list, tuple)) else V.shape[0]
    if tile is None:
        tile = _exact_tile(K)  # same VMEM shape: 1 forward + K chains
    return _dispatch(
        x, V, w_in, b_eff, layers, conditional, "tangents", D, c0, c1,
        tile, interpret, compute_dtype, n_tan=K, activation=cfg.activation,
    )


def fused_drift_sketch(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    probes,
    sketch_mode: str,
    conditional: Optional[jax.Array] = None,
    c0: jax.Array = 0.0,
    c1: jax.Array = 1.0,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Whole Hutch++/XTrace RHS in ONE kernel dispatch.

    ``sketch_mode``: 'hutchpp' with ``probes = (S, G)`` ((r, B, D) sketch +
    (m, B, D) residual probes), or 'xtrace' with ``probes = (O,)``
    ((m, B, D)).  Returns ``(drift (B, D), div (B,))`` — the divergence of
    the affine drift c0 x + c1 net, i.e. the same contract as
    :func:`fused_drift` with a probe.

    vs the two-dispatch ``fused_drift_tangents`` + host-side sketch
    algebra (ops/trace.{hutchpp,xtrace}_core): the forward layer chain
    runs ONCE (the second Jacobian application reuses the stored
    activation derivatives), the per-sample QR/leave-one-out algebra runs
    in the kernel's lane dimension, and no (K, B, D) intermediate ever
    touches HBM.  Measured: the dominant per-RHS fixed cost (dispatch +
    inter-dispatch XLA ops) is paid once instead of twice.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.n_dimensions
    if not supports_config(cfg.units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    layers = params["layers"]
    _check_conditional(cfg.n_conditionals, conditional)
    w_in, b_eff = _score_first_layer(params, cfg, t, conditional)

    V, n_tan, n_tan2 = _stack_sketch_probes(probes, sketch_mode, D)
    if tile is None:
        # live VMEM: n_hidden stored dh chains + 1 transient tangent;
        # 1024 measured best on v5e at 50k rows (2.20 ms/RHS vs 2.39 at
        # 512 for the r=m=1 Hutch++ 128^3 net)
        tile = 1024
    return _dispatch(
        x, V, w_in, b_eff, layers, conditional, sketch_mode, D, c0, c1,
        tile, interpret, compute_dtype, n_tan=n_tan,
        activation=cfg.activation, n_tan2=n_tan2,
    )


def fused_velocity_sketch(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    probes,
    sketch_mode: str,
    conditional: Optional[jax.Array] = None,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """One-dispatch Hutch++/XTrace for the flow velocity nets (c0=0, c1=1).

    Same contract as :func:`fused_drift_sketch`; the scalar solver time
    folds into the first-layer bias as in :func:`fused_velocity`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.target_dimension
    if not supports_config(cfg.hidden_units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    layers = params["layers"]
    _check_conditional(cfg.conditional_dimension, conditional)
    w_in, b_eff = _velocity_first_layer(params, cfg, t, conditional)

    V, n_tan, n_tan2 = _stack_sketch_probes(probes, sketch_mode, D)
    if tile is None:
        tile = 1024  # see fused_drift_sketch
    return _dispatch(
        x, V, w_in, b_eff, layers, conditional, sketch_mode, D, 0.0, 1.0,
        tile, interpret, compute_dtype, n_tan=n_tan,
        activation=cfg.activation, n_tan2=n_tan2,
    )


def fused_velocity_tangents(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    V: jax.Array,
    conditional: Optional[jax.Array] = None,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Fused velocity + J V probe stack for the flow nets (c0=0, c1=1).

    Same contract as :func:`fused_drift_tangents`; the scalar solver time
    folds into the first-layer bias exactly as in :func:`fused_velocity`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.target_dimension
    if not supports_config(cfg.hidden_units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    layers = params["layers"]
    _check_conditional(cfg.conditional_dimension, conditional)
    w_in, b_eff = _velocity_first_layer(params, cfg, t, conditional)

    K = len(V) if isinstance(V, (list, tuple)) else V.shape[0]
    if tile is None:
        tile = _exact_tile(K)  # same VMEM shape: 1 forward + K chains
    return _dispatch(
        x, V, w_in, b_eff, layers, conditional, "tangents", D, 0.0, 1.0,
        tile, interpret, compute_dtype, n_tan=K, activation=cfg.activation,
    )


def fused_symplectic_velocity(
    params: dict,
    cfg,
    t: jax.Array,
    state: jax.Array,
    conditional: Optional[jax.Array] = None,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Fused Hamiltonian velocity [dq/dt, dp/dt] (models/nets.py
    apply_symplectic_mlp; reference symplectic.py:82-123).

    The two separable-Hamiltonian nets take inputs ordered
    [x_other | cond | t_emb] — the Fourier time embedding sits at the END
    of the feature vector (unlike the score net), so for a batch-global
    solver time it folds into a first-layer bias from the TRAILING weight
    rows.  Each net is then exactly the V4 score-kernel shape with
    (c0, c1) = (0, +1) for the q-net on p and (0, -1) for the p-net on q:
    two dispatches, no new kernel code.  The joint field needs no
    divergence output — it is zero by construction.
    """
    from ..models.nets import fourier_time_embedding

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.n_data_dims
    C = cfg.n_conditionals
    if not supports_config(cfg.units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    _check_conditional(cfg.n_conditionals, conditional)

    t = jnp.asarray(t, jnp.float32).reshape(())
    temb = fourier_time_embedding(t[None], params["W"])[0]
    q, p = jnp.split(state, 2, axis=-1)

    outs = []
    for layers, x_in, c1 in (
        (params["q_layers"], p, 1.0),
        (params["p_layers"], q, -1.0),
    ):
        w1 = layers[0]["w"]  # (D + C + E, H), rows [x_other | cond | temb]
        b_eff = layers[0]["b"] + temb @ w1[D + C :]
        w_in = w1[:D] if conditional is None else w1[: D + C]
        outs.append(
            _dispatch(
                x_in, None, w_in, b_eff, layers, conditional, "forward",
                D, 0.0, c1, tile, interpret, compute_dtype,
                activation=cfg.activation,
            )
        )
    return jnp.concatenate(outs, axis=-1)


def _dispatch(
    x, e, w_in, b_eff, layers, conditional, mode, d_out, c0, c1, tile,
    interpret, compute_dtype, n_tan=0, activation="silu", n_tan2=0,
):
    """Shared host-side tail of the kernel entry points: tiling plan,
    padding, weight casting/flattening, impl call, un-transpose.

    For ``mode='tangents'`` ``e`` is the probe stack (n_tan, B, d_out);
    for the sketch modes it is the full (n_tan + n_tan2, B, d_out) stack."""
    max_sub = 16 if mode == "forward" else 8
    if tile is None:
        tile = 4096 if mode == "forward" else 1024
    # Wide-feature IO clamp: the per-grid-step x/probe/output blocks are
    # (rows, tile * max_sub) f32, so their footprint scales with the
    # feature count — shrink the tile until they fit an ~8 MiB budget.
    # Applied to EVERY tile (the mode defaults above, the wrapper-tuned
    # tiles like fused_drift's 2048/3072 and the sketch 1024, and
    # explicit arguments): the legacy <=16-feature envelope sits under
    # the budget at all of those, so this only bites wide configs —
    # which would otherwise Mosaic-OOM at compile (e.g. D=64 hutchinson
    # at fused_drift's 2048 default keeps ~12.6 MiB of IO blocks per
    # grid step, ~25 MiB double-buffered).  Shrink-only: a small
    # explicit tile is honoured untouched.
    d_in_total = x.shape[1] + (
        conditional.shape[1] if conditional is not None else 0
    )
    if mode == "hutchinson":
        io_rows = d_out + 1
    elif mode == "tangents":
        io_rows = 2 * n_tan * d_out  # probe stack in, jv stack out
    elif mode in ("hutchpp", "xtrace"):
        io_rows = (n_tan + n_tan2) * d_out + 1
    else:
        io_rows = 0
    tile = _io_clamped_tile(tile, max_sub, d_in_total + io_rows + d_out)
    # Width/depth activation clamp: the wrapper-tuned tiles are calibrated
    # for the 128-wide reference net, but the live in-kernel activation
    # set scales with hidden width H (and, for the stored-derivative
    # modes, with depth) — the H=128 configs all sit under the budget,
    # so this only bites wider/deeper nets.  Shrink-only, like the IO
    # clamp above.  See vmem_width_clamp for the calibration story.
    H = int(b_eff.shape[0])
    n_hidden = max(1, len(layers) - 1)
    if mode in ("tangents", "hutchpp", "xtrace"):
        chains = n_hidden + 3  # stored dh per hidden layer + transients
    elif mode == "exact":
        chains = d_out + 3  # d_out basis-tangent chains + transients
    else:
        chains = 4  # forward/hutchinson: a, h, dh, tangent transients
    tile = vmem_width_clamp(tile, H, chains)
    x_in = x if conditional is None else jnp.concatenate([x, conditional], -1)
    B = x_in.shape[0]
    # Tangent modes keep 2+ activation chains plus double-buffered in/out
    # blocks live: halve the per-grid-step packing to stay inside VMEM.
    tile, n_sub, padded = _grid_plan(B, tile, max_sub=max_sub)
    pad = padded - B
    if pad:
        x_in = jnp.pad(x_in, ((0, pad), (0, 0)))
    e_in = None
    if mode == "hutchinson":
        # the kernel projects the probe with nrows=d_out: no zero-padding
        # over conditional columns (C wasted rank-1 passes per chunk)
        e_in = e
        if pad:
            e_in = jnp.pad(e_in, ((0, pad), (0, 0)))
    elif mode in ("tangents", "hutchpp", "xtrace"):
        # stack probes feature-wise: row k*d_out + j of e_in.T is V[k,:,j].
        # ``e`` is a (K, B, D) stack or a list of (D, B) columns.
        if isinstance(e, (list, tuple)):
            e_in = jnp.concatenate([v.T for v in e], axis=-1)
        else:
            e_in = jnp.concatenate([e[k] for k in range(e.shape[0])], axis=-1)
        if pad:
            e_in = jnp.pad(e_in, ((0, pad), (0, 0)))

    wdt, _ = _compute_mode(compute_dtype)
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"].astype(wdt))
        hidden_flat.append(l["b"][None, :])
    c0c1 = jnp.stack(
        [jnp.asarray(c0, jnp.float32), jnp.asarray(c1, jnp.float32)]
    ).reshape(1, 2)

    out = _fused_drift_impl(
        x_in.T,
        None if e_in is None else e_in.T,
        w_in.astype(wdt),
        b_eff[None, :],
        tuple(hidden_flat),
        layers[-1]["w"].astype(wdt),
        layers[-1]["b"][None, :],
        c0c1,
        n_hidden=len(layers) - 1,
        mode=mode,
        d_out=d_out,
        tile=tile,
        n_sub=n_sub,
        interpret=interpret,
        compute_dtype=compute_dtype,
        n_tan=n_tan,
        activation=activation,
        n_tan2=n_tan2,
    )
    if mode == "tangents":
        driftT, jvT = out
        # (d_out, B) drift columns + n_tan (d_out, B) J v columns — the
        # batch-in-lanes layout ops/trace's sketch algebra consumes.
        return driftT[:, :B], [
            jvT[k * d_out : (k + 1) * d_out, :B] for k in range(n_tan)
        ]
    if mode != "forward":
        driftT, div = out
        return driftT.T[:B], div[0, :B]
    return out.T[:B]


def fused_velocity(
    params: dict,
    cfg,
    t: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
    e: Optional[jax.Array] = None,
    exact_divergence: bool = False,
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
):
    """Fused flow-matching velocity net v(x, t[, c]) (+ divergence).

    Divergence modes: pass ``e`` for the Hutchinson estimate, or
    ``exact_divergence=True`` for the exact trace via d_out basis-tangent
    chains (same in-kernel machinery as :func:`fused_drift`'s exact mode —
    the reference flow module only offers exact divergence, flow.py:122-166).

    The flow nets take raw scalar time as an input *feature* appended after
    x (models/nets.py VelocityMLPConfig; reference flow.py:110-118), so for
    a batch-global solver time the t-column folds into a first-layer bias:
      b_eff = b1 + t * W1[t_row]   with W1 rows ordered [x | t | cond].
    Everything else reuses the score-net kernel with (c0, c1) = (0, 1).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.target_dimension
    if not supports_config(cfg.hidden_units, cfg.activation):
        params, cfg = pad_to_lanes(params, cfg)
    _check_conditional(cfg.conditional_dimension, conditional)
    layers = params["layers"]
    w_in, b_eff = _velocity_first_layer(params, cfg, t, conditional)

    if e is not None and exact_divergence:
        raise ValueError("pass a probe e OR exact_divergence, not both")
    mode = (
        "hutchinson" if e is not None
        else ("exact" if exact_divergence else "forward")
    )
    if tile is None and mode == "exact":
        tile = _exact_tile(D)
    return _dispatch(
        x, e, w_in, b_eff, layers, conditional, mode, D, 0.0, 1.0, tile,
        interpret, compute_dtype, activation=cfg.activation,
    )


def fused_drift_reference(params, cfg, t, x, conditional=None, e=None, c0=0.0, c1=1.0):
    """Pure-XLA reference implementation (same math) for testing."""
    from ..models.nets import apply_score_mlp

    def net(xx):
        return apply_score_mlp(cfg, params, jnp.full((xx.shape[0],), t), xx, conditional)

    if e is None:
        return c0 * x + c1 * net(x)
    out, je = jax.jvp(net, (x,), (e,))
    drift = c0 * x + c1 * out
    # e^T (c0 I + c1 J_net) e = c0 |e|^2 + c1 e^T J_net e (|e|^2 = D only
    # for Rademacher probes)
    div = c0 * jnp.sum(e * e, axis=-1) + c1 * jnp.sum(je * e, axis=-1)
    return drift, div
