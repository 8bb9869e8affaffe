"""Checkpointing: everything needed for inference lives in the checkpoint.

The reference persists implicitly through torch ``state_dict`` buffers
(shift/scale/Fourier-W are registered buffers precisely so they serialize,
diffusion.py:73-80, 1537-1552; SURVEY.md §5.4).  Here a model *is* a pytree
whose array leaves include those statistics, so a checkpoint is simply the
pytree + the static config.  Two backends:

  * orbax (preferred): async-capable, sharded-array aware;
  * a dependency-free npz fallback (``save_npz``/``load_npz``) usable
    anywhere — one .npz archive with a JSON metadata entry (leaf paths,
    dtypes), written atomically (tmp + os.replace).

Static (non-array) dataclass fields are reconstructed from the template
model passed to ``load`` — configs are code, arrays are data.
"""

from __future__ import annotations

import json
import os

from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "save_npz",
    "load_npz",
    "read_npz_extra",
    "save_orbax",
    "load_orbax",
]


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return names, leaves, treedef


def save_npz(path: str, model: Any, extra: Optional[dict] = None) -> None:
    """Serialize all array leaves of a model pytree to one .npz file.

    Atomic (tmp + os.replace): an interrupted save never truncates a
    previous good checkpoint.  Non-native dtypes (bfloat16, float8 —
    which np.savez silently corrupts to void) are stored as raw bytes
    with their dtype recorded in the metadata.
    """
    names, leaves, _ = _flatten_with_paths(model)
    arrays, dtypes = {}, []
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        dtypes.append(str(a.dtype))
        if a.dtype.kind == "V" or a.dtype.name not in np.sctypeDict:
            # ml_dtypes leaf (bf16/f8): round-trip as raw bytes
            arrays[f"leaf_{i}"] = np.frombuffer(
                np.ascontiguousarray(a).tobytes(), np.uint8
            )
        else:
            arrays[f"leaf_{i}"] = a
    meta = json.dumps(
        {
            "names": names,
            "n": len(leaves),
            "dtypes": dtypes,
            "shapes": [list(np.shape(l)) for l in leaves],
            # caller-owned metadata (e.g. the CLI's architecture hyper-
            # parameters) rides INSIDE the archive: self-contained and
            # atomic with the weights
            "extra": extra or {},
        }
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays
        )
    os.replace(tmp, path)


def read_npz_extra(path: str) -> dict:
    """The caller-owned metadata embedded by ``save_npz(..., extra=)``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
    return meta.get("extra", {})


def load_npz(path: str, template: Any) -> Any:
    """Restore array leaves into the structure of ``template``.

    ``template`` provides the pytree structure and static config; its array
    values are replaced by the checkpointed ones (shapes are validated).
    """
    import jax.numpy as jnp

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        raw = [data[f"leaf_{i}"] for i in range(meta["n"])]
    names, t_leaves, treedef = _flatten_with_paths(template)
    if names != meta["names"]:
        raise ValueError(
            "checkpoint/template structure mismatch:\n"
            f"  checkpoint: {meta['names']}\n  template:   {names}"
        )
    dtypes = meta.get("dtypes")
    shapes = meta.get("shapes")
    leaves = []
    for i, arr in enumerate(raw):
        if dtypes is not None and arr.dtype == np.uint8 and dtypes[i] != "uint8":
            # raw-bytes leaf (bf16/f8): reconstruct from the recorded dtype
            arr = np.frombuffer(
                arr.tobytes(), jnp.dtype(dtypes[i])
            ).reshape(shapes[i])
        leaves.append(arr)
    for name, saved, cur in zip(names, leaves, t_leaves):
        if hasattr(cur, "shape") and tuple(saved.shape) != tuple(np.shape(cur)):
            raise ValueError(
                f"shape mismatch at {name}: checkpoint {saved.shape} vs "
                f"template {np.shape(cur)}"
            )
        if hasattr(cur, "dtype") and np.dtype(saved.dtype) != np.dtype(cur.dtype):
            raise ValueError(
                f"dtype mismatch at {name}: checkpoint {saved.dtype} vs "
                f"template {np.dtype(cur.dtype)} — cast the template (or "
                "the checkpoint) explicitly; silent casting changes values"
            )

    from jax.sharding import SingleDeviceSharding

    def place(l, cur):
        a = jnp.asarray(l)
        sh = getattr(cur, "sharding", None)
        # honour an explicit (multi-device) template sharding like the
        # orbax path does; ordinary eager template leaves carry an
        # incidental SingleDeviceSharding and must stay uncommitted
        if sh is not None and not isinstance(sh, SingleDeviceSharding):
            a = jax.device_put(a, sh)
        return a

    new_leaves = [place(l, c) for l, c in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_orbax(path: str, model: Any) -> None:
    """Orbax checkpoint (directory) of the model pytree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # force=True: periodic checkpointing overwrites (matching save_npz);
    # orbax's default refuses an existing destination
    ckptr.save(os.path.abspath(path), model, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Any) -> Any:
    """Restore a pytree saved with ``save_orbax`` into ``template``'s structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
