"""Device meshes and batch sharding for million-sample workloads.

The reference is single-process/single-device (no torch.distributed
anywhere; SURVEY.md §2 "Parallelism strategies: NONE").  Its north-star
workload — bulk conditional density evaluation and sampling — is
embarrassingly batch-parallel, so the TPU-native scaling axis is the batch:

  * ``make_mesh`` builds a 1-D (or 2-D data×model) ``jax.sharding.Mesh``
    over ICI-connected devices;
  * ``shard_batch`` places batch-major arrays with a ``NamedSharding`` on
    the 'data' axis;
  * ``data_parallel`` jits a per-batch function with sharded inputs/outputs
    so XLA partitions the whole computation (including adaptive ODE solves:
    the solver's RMS error-norm reductions lower to ``psum`` over the mesh,
    preserving the reference's batch-global stepping semantics — SURVEY.md
    §7 hard part 4);
  * ``data_parallel_per_shard`` shard_maps a per-batch function so each
    device solves its rows independently — the pod deployment path for the
    fused Pallas kernels (which GSPMD cannot partition under plain jit).

``tensor_parallel``-style sharding of the MLP hidden dimension is exposed
via a 2-D mesh ('data', 'model') for the multi-chip dry-run path; for the
model sizes this framework targets the hidden layers fit per-chip and dp is
the performant choice.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel",
    "data_parallel_per_shard",
    "pad_to_multiple",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis: int = 1,
) -> Mesh:
    """Mesh over the given devices: ('data',) or ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    # process-contiguous order: real TPU topologies interleave host device
    # ids (v5e-16 host 0 owns {0,1,4,5}), and jax.devices() is id-ordered;
    # sorting by (process, id) makes each process's rows one contiguous
    # global block so distributed.local_rows bookkeeping is exact.  On a
    # single host this is identical to id order.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if model_axis < 1:
        raise ValueError(f"model_axis must be >= 1, got {model_axis}")
    if model_axis == 1:
        return Mesh(np.asarray(devices), ("data",))
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def shard_batch(x: Any, mesh: Mesh) -> Any:
    """Place batch-major arrays across the mesh 'data' axis.

    Scalar (rank-0) leaves pass through unplaced.  Batch sizes must be
    divisible by the 'data' axis size — the error names
    :func:`pad_to_multiple` instead of surfacing a raw device_put
    message after an expensive upstream computation.
    """
    sharding = NamedSharding(mesh, P("data"))
    n_data = mesh.shape["data"]

    def place(a):
        if not (hasattr(a, "ndim") and a.ndim):
            return a
        if a.shape[0] % n_data:
            raise ValueError(
                f"batch size {a.shape[0]} is not divisible by the mesh's "
                f"{n_data}-device 'data' axis — pad with "
                "parallel.pad_to_multiple and slice the outputs"
            )
        return jax.device_put(a, sharding)

    return jax.tree_util.tree_map(place, x)


def replicate(x: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (e.g. model params) over the mesh.

    Non-array leaves (strings, callables in a user train-state) pass
    through untouched, mirroring ``shard_batch``'s guard.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding) if hasattr(a, "ndim") else a, x
    )


def data_parallel(
    fn: Callable,
    mesh: Mesh,
    donate_batch: bool = False,
) -> Callable:
    """jit ``fn(batch_pytree)`` with the batch sharded over 'data'.

    Close over the model/static arguments; the batch pytree is the single
    argument.  XLA inserts the collectives; nothing in ``fn`` changes.

    Scalar (rank-0) leaves in the batch pytree are replicated rather than
    batch-sharded (matching ``shard_batch``).  ``donate_batch=True``
    donates the jit argument — the *committed sharded* arrays; when the
    caller passes already-sharded inputs (``shard_batch`` is a no-op
    then) the caller's buffers themselves are reused, otherwise the
    internal resharded copy is what gets freed.
    """
    jfn = jax.jit(fn, donate_argnums=(0,) if donate_batch else ())

    def wrapped(batch):
        # committed input shardings (from shard_batch) drive the
        # partitioning; no in_shardings prefix, so scalar leaves are fine
        return jfn(shard_batch(batch, mesh))

    return wrapped


def data_parallel_per_shard(
    fn: Callable,
    mesh: Mesh,
    out_specs: Any = P("data"),
) -> Callable:
    """shard_map ``fn(batch_pytree)`` over 'data': each shard computes
    independently, with NO cross-shard collectives.

    Differences from ``data_parallel`` (jit auto-sharding), and when to
    prefer this:
      * adaptive solves step *per shard* rather than batch-globally (each
        chip's error norm covers only its rows — strictly finer-grained
        accept/reject than the reference's batch-global semantics, so
        accuracy is preserved while easy shards finish sooner);
      * Pallas kernels are safe inside: the GSPMD partitioner cannot
        partition a ``pallas_call`` under jit auto-sharding, but under
        shard_map each device runs the kernel on its local block — this is
        the deployment path for the fused RHS/EM kernels on a pod slice
        (set ``use_fused_kernel=True`` on the model);
      * ``fn`` must return batch-major arrays (shape divisible by the
        shard count); per-shard scalars (e.g. SolverStats) must be
        reshaped to (1,)-arrays or dropped — pass ``out_specs`` to
        override placement.

    Closed-over arrays (model params) are implicitly replicated.

    Rejects meshes with a non-trivial 'model' axis: rows are split only
    over 'data', so every model-axis device would silently re-run the
    identical shard (half a pod of wasted FLOPs on a 2-way model axis).
    """
    if "model" in mesh.shape and mesh.shape["model"] > 1:
        raise ValueError(
            "data_parallel_per_shard shards rows over 'data' only; a "
            f"{mesh.shape['model']}-way 'model' axis would redundantly "
            "recompute every shard — pass a 1-D ('data',) mesh"
        )

    _cache = {}

    def wrapped(batch):
        # per-leaf specs: scalar leaves replicate, batch leaves shard
        # (cached per pytree structure + leaf ranks)
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        key = (treedef, tuple(getattr(l, "ndim", 0) for l in leaves))
        if key not in _cache:
            in_specs = jax.tree_util.tree_unflatten(
                treedef,
                [P("data") if getattr(l, "ndim", 0) else P() for l in leaves],
            )
            sm = jax.shard_map(
                fn, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
                check_vma=False,
            )
            _cache[key] = jax.jit(sm)
        return _cache[key](shard_batch(batch, mesh))

    return wrapped


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0):
    """Pad the batch axis up to a multiple (for even sharding); returns
    (padded, original_length)."""
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, mode="edge"), n
