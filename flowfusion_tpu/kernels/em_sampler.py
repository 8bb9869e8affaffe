"""Pallas TPU kernel: the ENTIRE reverse-SDE Euler--Maruyama loop, fused.

The reference sampler is 100 Python-level iterations of
net-forward + elementwise update + fresh Gaussian noise
(/root/reference/flowfusion/diffusion.py:510-563).  The XLA `lax.scan`
version already removes Python dispatch; this kernel removes the remaining
HBM traffic: the state tile, every layer activation, and the noise
generation all live in VMEM across the *whole* step loop.  Like the drift
kernels (fused_mlp.py) it uses the V4 batch-in-lanes layout: activations
are (H, tile), hidden layers are MXU-native (H,H)@(H,tile), and the
Box--Muller chain runs on fully-occupied (1, tile) rows — the original
batch-major version measured SLOWER than the plain scan (407k vs 509k
samples/s, 50k rows f32) because its per-step relayouts and (tile, 1)
column transcendentals threw away the fusion win; in this layout the
f32 kernel matches the scan and the bf16 mode beats it by ~17% (740k).
Per batch tile the kernel:

  1. seeds the per-core PRNG from (seed, program_id);
  2. for each step (a rolled ``lax.fori_loop`` over the static count):
     a. reads the per-step scalars (c0, c1, g*sqrt(dt)) and the per-step
        effective first-layer bias (time-embedding folded in, see
        fused_mlp.py) from VMEM;
     b. runs the score-net layer chain on the MXU;
     c. draws N(0,1) noise via Box--Muller from pltpu.prng_random_bits;
     d. x_mean = x + (c0 x + c1 net) dt;  x = x_mean + g sqrt(dt) z.
  3. writes the final (x_mean, x) tile plus a per-tile divergence flag
     (the NaN-freeze keeps outputs finite, so the flag is the only
     signal a tile froze — see ``fused_em_sample``).

Host-side preparation computes, for the uniform grid t_s = T + s*dt:
  b1_eff[s]  = b1 + temb(t_s) @ W1_emb
  coeffs[s]  = (1 + c0(t_s) dt,  c1(t_s) dt,  g(t_s) sqrt(|dt|))
with c0/c1 the affine reverse-drift scalars (drift = c0 x + c1 net).

RNG note: noise comes from the TPU hardware PRNG, not the jax.random
stream — sample *distributions* match the lax.scan reference path, exact
draws do not (tests are statistical; SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (
    _act_value_fn,
    _check_conditional,
    in_proj_rows,
    supports_config,
    vmem_width_clamp,
)

__all__ = ["fused_em_sample", "em_prep"]

_TWO_PI = 2.0 * np.pi


def _em_weight_dtype(compute_dtype):
    """Operand dtype for the EM kernel.  'highf32' (the 3-pass likelihood
    mode, fused_mlp._compute_mode) maps to plain f32/HIGHEST here: the
    forward-only sampler has no parity contract tight enough to warrant
    the split-dot machinery."""
    return jnp.dtype(
        "float32" if str(compute_dtype) == "highf32" else compute_dtype
    )


def _normal_from_bits(shape):
    """Box--Muller on hardware random bits -> N(0,1) float32 of ``shape``.

    ``shape`` is (d, tile) — feature rows, BATCH IN LANES (the V4 layout):
    every transcendental below runs on fully-occupied (1, tile) lanes.
    The pre-V4 kernel drew (tile, 1)-shaped columns — 1/128 lane occupancy
    on the log/sqrt/cos/sin chain, which dominated its whole-step profile.

    ``prng_random_bits`` yields *int32*; the shift must be LOGICAL — an
    arithmetic ``>> 8`` keeps the sign bit, making u1 negative (log -> NaN)
    for half of all draws (caught on real TPU: all-NaN samples).

    Both Box--Muller halves are used (r cos and r sin are independent
    normals), halving the PRNG draws and log/sqrt work per element in the
    per-step hot loop.
    """
    d, cols = shape
    d2 = (d + 1) // 2
    bits1 = pltpu.prng_random_bits((d2, cols))
    bits2 = pltpu.prng_random_bits((d2, cols))
    # uniforms in (0, 1]: use the top 24 bits for an exact float mantissa
    top1 = jax.lax.shift_right_logical(bits1, jnp.int32(8))
    top2 = jax.lax.shift_right_logical(bits2, jnp.int32(8))
    u1 = top1.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    u2 = top2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    return z[:d, :]


def _kernel(steps: int, n_hidden: int, compute_dtype, hw_rng, with_cond, refs, activation: str = 'silu', b_real: int = 0):
    """Ref layout (V4, batch in lanes — see kernels/fused_mlp.py): all
    batch-shaped operands arrive TRANSPOSED, weights pre-transposed:
    [x0T (D,tile), seed(smem), (noiseT (steps,D,tile)),
     (cond_projT (H,tile)), coeffs (steps,3), b_effT (H,steps),
     w_inT (H,D), w_hT (H,H).., b_h (H,1).., w_outT (D,H), b_out (D,1)]
      -> [x_meanT (D,tile), xT (D,tile)]

    The batch lives in the LANE dimension through the whole step loop:
    hidden layers are MXU-native (H,H)@(H,tile), the first layer is a
    rank-D VPU accumulation, biases are (H,1) lane-broadcasts, and the
    Box--Muller noise chain runs on fully-occupied (1,tile) rows.  The
    pre-V4 batch-major kernel paid a lane->sublane relayout per step and
    ran its transcendentals on (tile,1) columns at 1/128 lane occupancy —
    measured SLOWER than the plain lax.scan path (407k vs 509k samples/s
    at 50k rows); this layout is what makes the fusion actually win.

    ``cond_projT`` is the per-sample, step-independent first-layer
    contribution of the conditional (cond_std @ W1_cond, transposed),
    precomputed host-side — conditioning costs one add per step.
    """
    i = 0
    x_ref = refs[i]; i += 1  # (D, tile)
    seed_ref = refs[i]; i += 1  # SMEM (1,)
    noise_ref = None
    if not hw_rng:
        noise_ref = refs[i]; i += 1  # (steps, D, tile) pre-drawn noise
    cond_ref = None
    if with_cond:
        cond_ref = refs[i]; i += 1  # (H, tile)
    coeffs_ref = refs[i]; i += 1  # (steps, 3)  [1 + c0 dt, c1 dt, g sqrt|dt|]
    b_eff_ref = refs[i]; i += 1  # (H, steps)
    w_in = refs[i]; i += 1  # (H, D)
    w_hidden, b_hidden = [], []
    for _ in range(n_hidden - 1):
        w_hidden.append(refs[i]); i += 1  # (H, H) [transposed]
        b_hidden.append(refs[i]); i += 1  # (H, 1)
    w_out = refs[i]; i += 1  # (D, H)
    b_out = refs[i]; i += 1  # (D, 1)
    mean_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    flag_ref = refs[i]  # (1, tile) per-tile ok flag (1.0 = no divergence)

    if hw_rng:
        # separate seed words: seed+program_id ADDITION would collide
        # streams across sequentially-seeded calls (call(seed=0) tile 1
        # == call(seed=1) tile 0)
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    # Parity mode (f32 weights) must request HIGHEST: inside Pallas the
    # default dot precision is a single bf16 MXU pass even for f32 operands
    # (~1e-3 relative error per matmul; see fused_mlp.py).
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm(w_, a_):
        return jnp.dot(
            w_,
            a_.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # tanh-form sigmoid in EVERY compute mode: the sampler has no
    # bit-parity contract to the scan path (its PRNG stream already
    # differs — only the sampled distribution matches), so the ~8e-6
    # primitive deviation is invisible next to the O(dt) EM
    # discretization error, and Mosaic's tanh is markedly cheaper than
    # its exp (see fused_mlp._act_pair_fn).
    act = _act_value_fn(activation, fast_sigmoid=True)
    d_in = x_ref.shape[0]

    # (H, steps) bias table read once; per-step column extracted by a
    # branchless one-hot masked lane-reduce (H*steps VPU ops per step —
    # negligible next to the (H,H)@(H,tile) matmuls).  A dynamic lane
    # slice b_eff[:, ds(s, 1)] would be the natural read, but Mosaic
    # rejects (H, 1) vector loads with a dynamic lane index.
    b_all = b_eff_ref[:]
    step_iota = jax.lax.broadcasted_iota(jnp.int32, b_all.shape, 1)

    # Lane-validity mask: the host pads the batch to a tile multiple with
    # zero rows, and a padding row's trajectory can go non-finite even
    # when every real row is healthy.  Excluding padding lanes from the
    # freeze predicate (like score.py's routed sample_sde path does for
    # its NaN flag) keeps a diverging padding row from freezing — and
    # stale-dating — the real samples sharing its tile.  ``b_real`` is
    # the unpadded batch size (static at trace time).
    tile_w = x_ref.shape[1]
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
        + pl.program_id(0) * tile_w
    )
    lane_valid = lane < b_real  # (1, tile): False on padding lanes

    def net(x, s):
        a = in_proj_rows(mm, w_in, x, d_in, d_in)
        b_col = jnp.sum(
            jnp.where(step_iota == s, b_all, 0.0), axis=1, keepdims=True
        )
        a = a + b_col
        if with_cond:
            a = a + cond_ref[:]
        for li in range(n_hidden - 1):
            a = mm(w_hidden[li][:], act(a)) + b_hidden[li][:]
        return mm(w_out[:], act(a)) + b_out[:]

    def body(s, carry):
        x, x_mean, ok = carry
        growth = coeffs_ref[s, 0]
        c1dt = coeffs_ref[s, 1]
        gsdt = coeffs_ref[s, 2]
        drift_term = net(x, s)
        new_mean = growth * x + c1dt * drift_term
        if hw_rng:
            z = _normal_from_bits(x.shape)
        else:
            z = noise_ref[s, :, :]
        new_x = new_mean + gsdt * z
        # NaN-freeze like the reference sampler and the lax.scan path
        # (fixed.euler_maruyama): a non-finite step stops updates and the
        # last finite state is returned instead of NaN poison.  Checking
        # new_x alone suffices (z is always finite, so a non-finite
        # new_mean makes new_x non-finite too — same predicate as the
        # scan path).  Granularity delta: the scan path freezes the WHOLE
        # batch; grid programs are independent, so this kernel freezes
        # per batch TILE — diverged solves keep more finite samples here,
        # and the per-tile flag output preserves the divergence
        # diagnostic either way.
        # (padding lanes count as finite).  NOTE: expressed as a boolean
        # OR, not jnp.where — Mosaic cannot lower a select with an i1
        # payload vector ("Unsupported target bitwidth for truncation").
        keep = ok & jnp.all(jnp.isfinite(new_x) | ~lane_valid)
        x = jnp.where(keep, new_x, x)
        x_mean = jnp.where(keep, new_mean, x_mean)
        return (x, x_mean, keep)

    x0 = x_ref[:]
    x, x_mean, ok = jax.lax.fori_loop(
        0, steps, body, (x0, x0, jnp.asarray(True))
    )
    mean_ref[:] = x_mean
    out_ref[:] = x
    # per-tile divergence flag (1.0 = clean): the freeze above guarantees
    # finite outputs, so callers cannot detect divergence from the
    # samples — this flag is the only signal that a tile froze.
    flag_ref[:] = jnp.broadcast_to(
        ok.astype(jnp.float32)[None, None], flag_ref.shape
    )


def em_prep(params: dict, cfg, sde, steps: int, no_sigma: bool):
    """Host-side per-step scalars and effective biases for the kernel."""
    from ..models.nets import fourier_time_embedding

    dt = -(sde.T - sde.epsilon) / steps
    ts = sde.T + dt * jnp.arange(steps, dtype=jnp.float32)

    c0 = sde.drift_coefficient(ts)  # (steps,)
    g2 = sde.diffusion_squared_scalar(ts)
    c1 = -g2  # reverse drift: f - g^2 s
    if not no_sigma:
        c1 = c1 / sde.sigma(ts)
    coeffs = jnp.stack(
        [1.0 + c0 * dt, c1 * dt, jnp.sqrt(g2) * np.sqrt(abs(dt))], axis=1
    )  # (steps, 3)

    E = cfg.embedding_dimensions
    temb = fourier_time_embedding(ts, params["W"])  # (steps, E)
    w1 = params["layers"][0]["w"]
    b_eff_all = params["layers"][0]["b"][None, :] + temb @ w1[:E]  # (steps, H)
    return coeffs, b_eff_all


@functools.partial(
    jax.jit,
    static_argnames=("steps", "n_hidden", "d_out", "tile", "interpret", "compute_dtype", "activation", "b_real"),
)
def _fused_em_impl(
    x0, seed, noise, cond_proj, coeffs, b_eff_all, w_in, hidden_flat, w_out, b_out,
    *, steps, n_hidden, d_out, tile, interpret, compute_dtype,
    activation="silu", b_real=None,
):
    B, D = x0.shape
    H = w_in.shape[1]
    grid = (B // tile,)

    # V4 orientation (see _kernel): batch-shaped operands transposed so
    # the batch rides the lane dimension; weights pre-transposed.  The
    # transposes trace into the jitted graph once per compile — tiny
    # host-side relayouts, not per-step work.
    xT = x0.T  # (D, B)
    w_inT = w_in.T  # (H, D)
    b_effT = b_eff_all.T  # (H, steps)
    hiddenT = tuple(a.T for a in hidden_flat)  # (H,H) w / (H,1) b
    w_outT = w_out.T  # (D, H)
    b_outT = b_out.T  # (D, 1)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    hw_rng = noise is None
    in_specs = [
        pl.BlockSpec((D, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
    ]
    operands = [xT, seed]
    if not hw_rng:
        in_specs.append(
            pl.BlockSpec((steps, D, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        operands.append(jnp.swapaxes(noise, 1, 2))  # (steps, D, B)
    with_cond = cond_proj is not None
    if with_cond:
        in_specs.append(
            pl.BlockSpec((H, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(cond_proj.T)
    in_specs += [wspec(coeffs.shape), wspec(b_effT.shape), wspec(w_inT.shape)]
    operands += [coeffs, b_effT, w_inT]
    for arr in hiddenT:
        in_specs.append(wspec(arr.shape))
        operands.append(arr)
    in_specs += [wspec(w_outT.shape), wspec(b_outT.shape)]
    operands += [w_outT, b_outT]

    kernel = lambda *refs: _kernel(
        steps, n_hidden, _em_weight_dtype(compute_dtype),
        hw_rng, with_cond,
        refs, activation=activation,
        b_real=B if b_real is None else b_real,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((D, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * steps * 2 * H * (D + (n_hidden - 1) * H + d_out),
            bytes_accessed=B * D * 4 * 3,
            transcendentals=B * steps * (H * n_hidden + D),
        ),
        interpret=interpret,
    )(*operands)
    # (x_mean, x, diverged): diverged=True iff ANY batch tile hit a
    # non-finite step and froze (the in-kernel freeze makes the sample
    # arrays themselves always finite, so this flag is the diagnostic).
    return out[0].T, out[1].T, jnp.any(out[2][0] < 0.5)


def fused_em_sample(
    params: dict,
    cfg,
    sde,
    x0: jax.Array,
    seed,
    conditional: Optional[jax.Array] = None,
    steps: int = 100,
    no_sigma: bool = False,
    tile: int = 2048,
    interpret: Optional[bool] = None,
    compute_dtype: str = "float32",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the fused EM loop from prior samples ``x0``; returns
    ``(x_mean, x, diverged)``.

    ``conditional`` (already standardized) is folded into a precomputed
    first-layer contribution — conditioning is one add per step in-kernel.
    ``seed`` is an int32 scalar; each batch tile derives an independent
    hardware-PRNG stream.  ``diverged`` is a scalar bool: True iff any
    batch tile hit a non-finite step on a REAL row and froze at its last
    finite state — rows added by tile padding are excluded from the
    freeze predicate, so a diverging padding row can neither freeze nor
    flag a tile of healthy samples
    (the in-kernel NaN-freeze keeps the returned samples finite, so the
    arrays alone cannot reveal divergence — callers must consult the
    flag, e.g. for ``EMResult.nan_encountered``).
    """
    if not supports_config(cfg.units, cfg.activation):
        from .fused_mlp import pad_to_lanes

        params, cfg = pad_to_lanes(params, cfg)
    _check_conditional(cfg.n_conditionals, conditional)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, D = x0.shape
    # Width clamp (same rationale and ONE shared formula as
    # fused_mlp._dispatch): the default tile is calibrated for H=128,
    # and the live per-tile activation set scales with the hidden width
    # — shrink-only so wider nets fit Mosaic's scoped-VMEM budget
    # instead of failing to compile.
    tile = vmem_width_clamp(tile, cfg.units[0], chains=4)
    tile = min(tile, B)
    pad = (-B) % tile
    if pad:
        x0 = jnp.pad(x0, ((0, pad), (0, 0)))

    coeffs, b_eff_all = em_prep(params, cfg, sde, steps, no_sigma)
    E = cfg.embedding_dimensions
    layers = params["layers"]
    wdt = _em_weight_dtype(compute_dtype)
    w_in = layers[0]["w"][E : E + D].astype(wdt)
    cond_proj = None
    if conditional is not None:
        w_cond = layers[0]["w"][E + D :]
        cond_proj = conditional @ w_cond  # (B, H), step-independent
        if pad:
            cond_proj = jnp.pad(cond_proj, ((0, pad), (0, 0)))
    hidden_flat = []
    for l in layers[1:-1]:
        hidden_flat.append(l["w"].astype(wdt))
        hidden_flat.append(l["b"][None, :])
    seed_arr = jnp.asarray([seed], jnp.int32)
    # Non-TPU backends: the interpreter stubs the hardware PRNG, so draw the
    # noise with jax.random and stream it through the kernel instead.
    noise = None
    if interpret:
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (steps,) + x0.shape, jnp.float32
        )

    x_mean, x, diverged = _fused_em_impl(
        x0, seed_arr, noise, cond_proj, coeffs, b_eff_all, w_in, tuple(hidden_flat),
        layers[-1]["w"].astype(wdt), layers[-1]["b"][None, :],
        steps=steps, n_hidden=len(layers) - 1, d_out=D, tile=tile,
        interpret=interpret, compute_dtype=compute_dtype,
        activation=cfg.activation, b_real=B,
    )
    return x_mean[:B], x[:B], diverged
