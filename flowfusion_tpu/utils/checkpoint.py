"""Checkpointing: everything needed for inference lives in the checkpoint.

The reference persists implicitly through torch ``state_dict`` buffers
(shift/scale/Fourier-W are registered buffers precisely so they serialize,
diffusion.py:73-80, 1537-1552; SURVEY.md §5.4).  Here a model *is* a pytree
whose array leaves include those statistics, so a checkpoint is simply the
pytree + the static config.  Two backends:

  * orbax (preferred): async-capable, sharded-array aware;
  * a dependency-free msgpack-of-npz fallback (``save_npz``/``load_npz``)
    usable anywhere.

Static (non-array) dataclass fields are reconstructed from the template
model passed to ``load`` — configs are code, arrays are data.
"""

from __future__ import annotations

import io
import json
import os

from typing import Any

import jax
import numpy as np

__all__ = ["save_npz", "load_npz", "save_orbax", "load_orbax"]


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return names, leaves, treedef


def save_npz(path: str, model: Any) -> None:
    """Serialize all array leaves of a model pytree to one .npz file."""
    names, leaves, _ = _flatten_with_paths(model)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = json.dumps({"names": names, "n": len(leaves)})
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_npz(path: str, template: Any) -> Any:
    """Restore array leaves into the structure of ``template``.

    ``template`` provides the pytree structure and static config; its array
    values are replaced by the checkpointed ones (shapes are validated).
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n"])]
    names, t_leaves, treedef = _flatten_with_paths(template)
    if names != meta["names"]:
        raise ValueError(
            "checkpoint/template structure mismatch:\n"
            f"  checkpoint: {meta['names']}\n  template:   {names}"
        )
    for name, saved, cur in zip(names, leaves, t_leaves):
        if hasattr(cur, "shape") and tuple(saved.shape) != tuple(np.shape(cur)):
            raise ValueError(
                f"shape mismatch at {name}: checkpoint {saved.shape} vs "
                f"template {np.shape(cur)}"
            )
    import jax.numpy as jnp

    new_leaves = [jnp.asarray(l) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, model: Any) -> None:
    """Orbax checkpoint (directory) of the model pytree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), model)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Any) -> Any:
    """Restore a pytree saved with ``save_orbax`` into ``template``'s structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
