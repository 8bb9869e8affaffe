"""Convert reference (PyTorch flowfusion) checkpoints to this framework.

A migration path for users of the reference library: load a torch
``state_dict`` (or an in-memory mapping of numpy arrays) and produce the
equivalent parameter pytree.  Input orderings of every network here match
the reference byte-for-byte (see models/nets.py docstring), so converted
weights reproduce the reference model exactly (torch Linear stores weight
as (out, in); we store (in, out) — transposed on import).

The wrappers' standardization statistics are part of the reference
checkpoints too (registered buffers: flow.py:77-87, symplectic.py:160-163,
diffusion.py:1537-1552) — extract them with
:func:`standardization_from_torch` and pass them to the model constructor,
or the converted model will standardize with the 0/1 defaults.

No torch import is required: pass any mapping name -> array
(``{k: v.numpy() for k, v in sd.items()}``).
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "score_mlp_from_torch",
    "velocity_mlp_from_torch",
    "symplectic_mlp_from_torch",
    "standardization_from_torch",
]


def _as_np(v, dtype):
    return np.asarray(v, dtype=dtype)


def _linear(sd: Mapping, prefix: str, dtype) -> dict:
    return {
        "w": jnp.asarray(_as_np(sd[f"{prefix}.weight"], dtype).T),
        "b": jnp.asarray(_as_np(sd[f"{prefix}.bias"], dtype)),
    }


def _layer_indices(sd: Mapping, prefix: str) -> list:
    """Linear-layer indices under an ``nn.Sequential`` prefix.

    Activations hold no parameters, so the ``{prefix}.{j}.weight`` keys
    are exactly the Linear layers.  Raises when nothing matches — a
    silent empty layer list would make the net a pass-through.
    """
    idxs = sorted(
        {
            int(k.split(".")[len(prefix.split("."))])
            for k in sd
            if k.startswith(prefix + ".") and k.endswith(".weight")
        }
    )
    if not idxs:
        raise KeyError(
            f"no '{prefix}.{{i}}.weight' keys in the state_dict — wrong "
            f"model or a wrapper prefix? (keys look like: "
            f"{sorted(sd)[:4]}...)"
        )
    return idxs


def score_mlp_from_torch(
    sd: Mapping, n_layers: Optional[int] = None, dtype=np.float32
) -> dict:
    """Reference ``MLP`` state_dict -> ``init_score_mlp``-style params.

    Keys: ``NN.{i}.weight/bias`` and ``W`` (diffusion.py:66-76).  Layer
    indices are inferred from the keys; ``n_layers``, if given, is
    validated against the checkpoint (an undersized count used to
    silently truncate the network).
    """
    idxs = _layer_indices(sd, "NN")
    if n_layers is not None and n_layers != len(idxs):
        raise ValueError(
            f"n_layers={n_layers} but the checkpoint has {len(idxs)} "
            f"Linear layers (NN.{{{', '.join(map(str, idxs))}}})"
        )
    return {
        "W": jnp.asarray(_as_np(sd["W"], dtype)),
        "layers": [_linear(sd, f"NN.{i}", dtype) for i in idxs],
    }


def velocity_mlp_from_torch(sd: Mapping, dtype=np.float32) -> dict:
    """Reference ``ODEFlow``/``ConditionalODEFlow`` velocity net.

    The torch net is an ``nn.Sequential`` of alternating Linear/activation
    (flow.py:62-74): linear layers are the keys ``velocity.{j}.weight``
    for even j (activations hold no params).  NB the reference checkpoint
    also carries ``target_shift``/``target_scale`` (and conditional)
    buffers — see :func:`standardization_from_torch`.
    """
    idxs = _layer_indices(sd, "velocity")
    return {"layers": [_linear(sd, f"velocity.{j}", dtype) for j in idxs]}


def symplectic_mlp_from_torch(sd: Mapping, dtype=np.float32) -> dict:
    """Reference ``SymplecticMLP`` (symplectic.py:45-50): two Sequentials
    ``mlp_q_dynamics`` / ``mlp_p_dynamics`` plus frozen ``W``."""

    def seq(prefix):
        return [
            _linear(sd, f"{prefix}.{j}", dtype)
            for j in _layer_indices(sd, prefix)
        ]

    return {
        "W": jnp.asarray(_as_np(sd["W"], dtype)),
        "q_layers": seq("mlp_q_dynamics"),
        "p_layers": seq("mlp_p_dynamics"),
    }


_STAT_NAMES = (
    "shift",
    "scale",
    "target_shift",
    "target_scale",
    "conditional_shift",
    "conditional_scale",
)


def standardization_from_torch(
    sd: Mapping, prefix: str = "", dtype=np.float32
) -> dict:
    """Extract the wrapper standardization buffers from a reference
    checkpoint.

    Returns whichever of ``shift/scale`` (diffusion/symplectic wrappers),
    ``target_shift/target_scale`` (flow) and
    ``conditional_shift/conditional_scale`` exist under ``prefix`` — pass
    the result's entries to the model constructor so the converted model
    standardizes like the original (these buffers are part of the
    reference model, flow.py:77-87, symplectic.py:160-163).
    """
    out = {}
    for name in _STAT_NAMES:
        key = f"{prefix}{name}" if prefix else name
        if key in sd:
            arr = _as_np(sd[key], dtype)
            if arr.ndim > 0 and arr.size > 0:
                out[name] = jnp.asarray(arr)
    return out
