"""Convert reference (PyTorch flowfusion) checkpoints to this framework.

A migration path for users of the reference library: load a torch
``state_dict`` (or an in-memory mapping of numpy arrays) and produce the
equivalent parameter pytree.  Input orderings of every network here match
the reference byte-for-byte (see models/nets.py docstring), so converted
weights reproduce the reference model exactly (torch Linear stores weight
as (out, in); we store (in, out) — transposed on import).

No torch import is required: pass any mapping name -> array
(``{k: v.numpy() for k, v in sd.items()}``).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

__all__ = [
    "score_mlp_from_torch",
    "velocity_mlp_from_torch",
    "symplectic_mlp_from_torch",
]


def _as_np(v):
    return np.asarray(v, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> dict:
    return {
        "w": jnp.asarray(_as_np(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(_as_np(sd[f"{prefix}.bias"])),
    }


def score_mlp_from_torch(sd: Mapping, n_layers: int) -> dict:
    """Reference ``MLP`` state_dict -> ``init_score_mlp``-style params.

    Keys: ``NN.{i}.weight/bias`` and ``W`` (diffusion.py:66-76).
    """
    return {
        "W": jnp.asarray(_as_np(sd["W"])),
        "layers": [_linear(sd, f"NN.{i}") for i in range(n_layers)],
    }


def velocity_mlp_from_torch(sd: Mapping) -> dict:
    """Reference ``ODEFlow``/``ConditionalODEFlow`` velocity net.

    The torch net is an ``nn.Sequential`` of alternating Linear/activation
    (flow.py:62-74): linear layers are the keys ``velocity.{j}.weight``
    for even j (activations hold no params).
    """
    idxs = sorted(
        {
            int(k.split(".")[1])
            for k in sd
            if k.startswith("velocity.") and k.endswith(".weight")
        }
    )
    return {"layers": [_linear(sd, f"velocity.{j}") for j in idxs]}


def symplectic_mlp_from_torch(sd: Mapping) -> dict:
    """Reference ``SymplecticMLP`` (symplectic.py:45-50): two Sequentials
    ``mlp_q_dynamics`` / ``mlp_p_dynamics`` plus frozen ``W``."""

    def seq(prefix):
        idxs = sorted(
            {
                int(k.split(".")[1])
                for k in sd
                if k.startswith(prefix + ".") and k.endswith(".weight")
            }
        )
        return [_linear(sd, f"{prefix}.{j}") for j in idxs]

    return {
        "W": jnp.asarray(_as_np(sd["W"])),
        "q_layers": seq("mlp_q_dynamics"),
        "p_layers": seq("mlp_p_dynamics"),
    }
