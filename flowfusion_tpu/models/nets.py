"""Neural networks: score / velocity / symplectic MLPs as pure pytrees.

TPU-native redesign of the reference networks (MLP: diffusion.py:9-121,
flow velocity nets: flow.py:62-74 and flow.py:506-524, SymplecticMLP:
symplectic.py:11-123).  Instead of stateful ``nn.Module``s, every network is
(a) a frozen, hashable config dataclass, and (b) a parameter pytree produced
by an ``init`` function and consumed by a pure ``apply`` function.  This
makes every model trivially compatible with ``jit``/``vmap``/``grad``/
``pjit`` and with orbax checkpointing.

Input orderings are kept byte-identical to the reference so that PyTorch
checkpoints can be converted weight-for-weight
(see ``flowfusion_tpu.utils.convert``):
  * score MLP input  = concat([t_embedding, x, conditional])
  * velocity net in  = concat([x, t, conditional])
  * symplectic q-net = concat([p, conditional, t_embedding]) (and q for p-net)

The Gaussian-Fourier time-embedding weights ``W`` are sampled once at init
(N(0, sigma_initialization^2)) and are *frozen* — reference sets
``requires_grad=False`` (diffusion.py:73-76).  Here they live in the param
pytree under the key ``"W"``; ``flowfusion_tpu.train`` masks them out of the
optimizer update, which reproduces the frozen semantics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "ScoreMLPConfig",
    "VelocityMLPConfig",
    "SymplecticMLPConfig",
    "init_score_mlp",
    "apply_score_mlp",
    "init_velocity_mlp",
    "apply_velocity_mlp",
    "init_symplectic_mlp",
    "apply_symplectic_mlp",
    "apply_symplectic_q_velocity",
    "apply_symplectic_p_velocity",
    "fourier_time_embedding",
]

_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    # exact (erf) form: torch.nn.GELU defaults to exact, and checkpoint
    # conversion promises reference-exact forwards (jax.nn.gelu's default
    # tanh approximation deviates by up to ~5e-4)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
}


def _validate_net_config(units, activation, embedding_dimensions=None):
    """Shared config validation: loud at construction, not first forward."""
    if activation not in _ACTIVATIONS:
        raise ValueError(
            f"unknown activation {activation!r}; use one of "
            f"{sorted(_ACTIVATIONS)}"
        )
    if embedding_dimensions is not None and embedding_dimensions % 2:
        raise ValueError(
            f"embedding_dimensions must be even (sin/cos pairs); got "
            f"{embedding_dimensions}"
        )


def _init_linear(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _init_mlp_stack(key: jax.Array, sizes: Tuple[int, ...], dtype=jnp.float32):
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        _init_linear(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)
    ]


def _apply_mlp_stack(layers, x: jax.Array, act, precision: str = "highest") -> jax.Array:
    """Feed-forward stack: activation on all but the last layer.

    ``precision`` controls the MXU matmul mode: 'highest' keeps true float32
    accumulation (required for the 1e-5 density-parity contract); 'default'
    allows bf16 MXU passes (fast path for sampling/benchmarks where ~1e-3
    is acceptable).
    """
    n = len(layers)
    prec = jax.lax.Precision(precision)
    for i, layer in enumerate(layers):
        x = jnp.dot(x, layer["w"], precision=prec) + layer["b"]
        if i < n - 1:
            x = act(x)
    return x


def fourier_time_embedding(t: jax.Array, W: jax.Array) -> jax.Array:
    """Gaussian-Fourier features: concat([sin(2 pi t W), cos(2 pi t W)]).

    Matches reference diffusion.py:109-110.  ``t``: (B,), ``W``: (E/2,).
    Returns (B, E).
    """
    proj = t[:, None] * W[None, :] * (2.0 * math.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _expand_t(t: jax.Array, batch: int, dtype=jnp.float32) -> jax.Array:
    """Broadcast scalar t to (B,), mirroring reference t handling.

    ``dtype`` follows the data (f64 runs keep f64 time; the reference
    preserves t's dtype) — f32 by default per the framework contract.
    """
    t = jnp.asarray(t, dtype)
    if t.ndim == 0:
        return jnp.full((batch,), t, dtype)
    return t


# ---------------------------------------------------------------------------
# Score network (diffusion module)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ScoreMLPConfig:
    """Architecture of the score network (reference MLP, diffusion.py:9-121)."""

    # NB n_conditionals defaults to 0 (unconditional) — a deliberate delta
    # from the reference MLP's n_conditionals=1 default, which is
    # unusable as-is: its forward with conditional=None concatenates only
    # [t_emb, x] and shape-errors against the 1-conditional first layer.
    n_dimensions: int = 2
    n_conditionals: int = 0
    embedding_dimensions: int = 8
    units: Tuple[int, ...] = (128,)
    activation: str = "silu"
    sigma_initialization: float = 16.0
    precision: str = "highest"

    def __post_init__(self):
        object.__setattr__(self, "units", tuple(self.units))
        _validate_net_config(
            self.units, self.activation, self.embedding_dimensions
        )

    @property
    def architecture(self) -> Tuple[int, ...]:
        return (
            self.n_dimensions + self.n_conditionals + self.embedding_dimensions,
            *self.units,
            self.n_dimensions,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Initialize the parameter pytree (alias for ``init_score_mlp``)."""
        return init_score_mlp(key, self, dtype)

    def apply(self, params, t, x, conditional=None) -> jax.Array:
        """Pure forward pass (alias for ``apply_score_mlp``)."""
        return apply_score_mlp(self, params, t, x, conditional)


def init_score_mlp(key: jax.Array, cfg: ScoreMLPConfig, dtype=jnp.float32) -> dict:
    """Parameter pytree for ``ScoreMLPConfig``: frozen Fourier ``W`` + layers."""
    k_w, k_net = jax.random.split(key)
    W = (
        jax.random.normal(k_w, (cfg.embedding_dimensions // 2,), dtype)
        * cfg.sigma_initialization
    )
    return {"W": W, "layers": _init_mlp_stack(k_net, cfg.architecture, dtype)}


def apply_score_mlp(
    cfg: ScoreMLPConfig,
    params: dict,
    t: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """net(t, x, cond): input = concat([t_emb, x, cond]) (diffusion.py:100-113)."""
    act = _ACTIVATIONS[cfg.activation]
    if conditional is not None:
        x = jnp.concatenate([x, conditional], axis=-1)
    t = _expand_t(t, x.shape[0], x.dtype)
    t_emb = fourier_time_embedding(t, params["W"])
    h = jnp.concatenate([t_emb, x], axis=-1)
    return _apply_mlp_stack(params["layers"], h, act, cfg.precision)


# ---------------------------------------------------------------------------
# Velocity network (flow module)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VelocityMLPConfig:
    """Flow-matching velocity net (reference flow.py:62-74, 506-524).

    Time enters as a raw scalar feature appended after x (no Fourier
    embedding), matching the reference flow module.
    """

    target_dimension: int = 1
    conditional_dimension: int = 0
    hidden_units: Tuple[int, ...] = (128, 128)
    activation: str = "silu"
    precision: str = "highest"

    def __post_init__(self):
        object.__setattr__(self, "hidden_units", tuple(self.hidden_units))
        _validate_net_config(self.hidden_units, self.activation)

    @property
    def architecture(self) -> Tuple[int, ...]:
        return (
            self.target_dimension + 1 + self.conditional_dimension,
            *self.hidden_units,
            self.target_dimension,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Initialize the parameter pytree (alias for ``init_velocity_mlp``)."""
        return init_velocity_mlp(key, self, dtype)

    def apply(self, params, t, x, conditional=None) -> jax.Array:
        """Pure forward pass (alias for ``apply_velocity_mlp``)."""
        return apply_velocity_mlp(self, params, t, x, conditional)


def init_velocity_mlp(key: jax.Array, cfg: VelocityMLPConfig, dtype=jnp.float32):
    """Parameter pytree for ``VelocityMLPConfig`` (plain layer stack)."""
    return {"layers": _init_mlp_stack(key, cfg.architecture, dtype)}


def apply_velocity_mlp(
    cfg: VelocityMLPConfig,
    params: dict,
    t: jax.Array,
    x: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """v(x, t[, cond]): input = concat([x, t, cond]) (flow.py:110-118, 578-590)."""
    act = _ACTIVATIONS[cfg.activation]
    t = _expand_t(t, x.shape[0], x.dtype)[:, None]
    parts = [x, t] if conditional is None else [x, t, conditional]
    h = jnp.concatenate(parts, axis=-1)
    return _apply_mlp_stack(params["layers"], h, act, cfg.precision)


# ---------------------------------------------------------------------------
# Symplectic network (Hamiltonian module)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SymplecticMLPConfig:
    """Divergence-free field for separable Hamiltonians (symplectic.py:11-123).

    dq/dt = mlp_q(p, cond, t_emb); dp/dt = -mlp_p(q, cond, t_emb).
    """

    n_data_dims: int = 2
    n_conditionals: int = 0
    embedding_dimensions: int = 8
    units: Tuple[int, ...] = (128,)
    activation: str = "silu"
    sigma_initialization: float = 16.0
    precision: str = "highest"

    def __post_init__(self):
        object.__setattr__(self, "units", tuple(self.units))
        _validate_net_config(
            self.units, self.activation, self.embedding_dimensions
        )

    @property
    def architecture(self) -> Tuple[int, ...]:
        return (
            self.n_data_dims + self.n_conditionals + self.embedding_dimensions,
            *self.units,
            self.n_data_dims,
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Initialize the parameter pytree (alias for ``init_symplectic_mlp``)."""
        return init_symplectic_mlp(key, self, dtype)

    def apply(self, params, t, state, conditional=None) -> jax.Array:
        """Divergence-free joint field (alias for ``apply_symplectic_mlp``)."""
        return apply_symplectic_mlp(self, params, t, state, conditional)


def init_symplectic_mlp(key: jax.Array, cfg: SymplecticMLPConfig, dtype=jnp.float32):
    """Parameter pytree for ``SymplecticMLPConfig``: frozen ``W`` + q/p stacks."""
    k_w, k_q, k_p = jax.random.split(key, 3)
    W = (
        jax.random.normal(k_w, (cfg.embedding_dimensions // 2,), dtype)
        * cfg.sigma_initialization
    )
    return {
        "W": W,
        "q_layers": _init_mlp_stack(k_q, cfg.architecture, dtype),
        "p_layers": _init_mlp_stack(k_p, cfg.architecture, dtype),
    }


def apply_symplectic_mlp(
    cfg: SymplecticMLPConfig,
    params: dict,
    t: jax.Array,
    state: jax.Array,
    conditional: Optional[jax.Array] = None,
) -> jax.Array:
    """Hamiltonian velocity [dq/dt, dp/dt] (symplectic.py:82-123).

    ``state`` is (B, 2D) = concat([q, p]).  The q-dynamics net sees p (and
    vice versa), which makes the joint field exactly divergence-free.
    """
    q, p = jnp.split(state, 2, axis=-1)
    v_q = apply_symplectic_q_velocity(cfg, params, t, p, conditional)
    v_p = apply_symplectic_p_velocity(cfg, params, t, q, conditional)
    return jnp.concatenate([v_q, v_p], axis=-1)


def _symplectic_half(cfg, params, stack, t, other, conditional):
    act = _ACTIVATIONS[cfg.activation]
    t = _expand_t(t, other.shape[0], other.dtype)
    t_emb = fourier_time_embedding(t, params["W"])
    if conditional is not None:
        h = jnp.concatenate([other, conditional, t_emb], axis=-1)
    else:
        h = jnp.concatenate([other, t_emb], axis=-1)
    return _apply_mlp_stack(params[stack], h, act, cfg.precision)


def apply_symplectic_q_velocity(cfg, params, t, p, conditional=None):
    """dq/dt = mlp_q(p, cond, t_emb) — one half of the joint field, for
    integrators that only need one force at a time (leapfrog kicks run
    2x the necessary FLOPs through the joint apply)."""
    return _symplectic_half(cfg, params, "q_layers", t, p, conditional)


def apply_symplectic_p_velocity(cfg, params, t, q, conditional=None):
    """dp/dt = -mlp_p(q, cond, t_emb) — the other half."""
    return -_symplectic_half(cfg, params, "p_layers", t, q, conditional)
