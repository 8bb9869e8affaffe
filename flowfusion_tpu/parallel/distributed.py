"""Multi-host (DCN) deployment: process initialization and global batches.

The reference has no distributed layer at all (SURVEY.md §5.8); on TPU the
single-slice path in ``sharding.py`` already scales over ICI.  This module
adds the *multi-host* layer for pod slices larger than one host (v5e-16+)
or multi-slice DCN deployments:

  * ``initialize_distributed`` — one call per process before any jax use;
    wraps ``jax.distributed.initialize`` with TPU-pod environment-variable
    autodetection (on Cloud TPU all arguments are inferred) and is a no-op
    for single-process runs, so the same entry script works on one chip,
    one host, or a pod.
  * ``global_batch_from_local`` — each process holds only its local rows
    (e.g. from its shard of a dataset); assemble them into one global
    jax.Array sharded over the mesh 'data' axis without gathering to any
    single host (``jax.make_array_from_process_local_data``).
  * ``local_rows`` — the inverse bookkeeping: the (start, stop) row range
    of this process's shard of a global batch.

Typical pod-slice usage::

    initialize_distributed()                      # no-op if single process
    mesh = make_mesh()                            # all devices, all hosts
    x_global = global_batch_from_local(x_local, mesh)
    lp = data_parallel(lambda b: model.log_prob(b)[0], mesh)(x_global)

Collectives ride ICI within a slice and DCN across slices; nothing in the
model or solver code changes — the adaptive solver's error-norm reductions
lower to psums over the same mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_distributed", "global_batch_from_local", "local_rows"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs: Any,
) -> int:
    """Initialize multi-process JAX; returns the process index.

    No-op (returns 0) when the run is single-process and no coordinator is
    configured — call it unconditionally at program start.  On Cloud TPU
    pods all arguments are autodetected; elsewhere pass them explicitly or
    via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # Idempotent re-entry, checked UP FRONT: after a successful first call
    # this function itself initializes the XLA backend (process_index), and
    # jax 0.9's initialize() then raises a backend-already-initialized
    # error whose text older string-matching missed.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return jax.process_index()
    except Exception:
        pass

    # A GKE TPU pod slice exposes the full worker list; multi-slice DCN
    # deployments set the MEGASCALE coordinator.  NB GCE-provisioned pods
    # (gcloud compute tpus tpu-vm create) expose neither env var — there
    # JAX's own metadata-server autodetection applies, so pass
    # coordinator/num_processes/process_id explicitly or set
    # JAX_COORDINATOR_ADDRESS (this function cannot probe the metadata
    # server without network access at import sites).
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    multi_host_pod = (
        len(workers) > 1
        or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    )
    if coordinator_address is None and not multi_host_pod and not (
        num_processes and num_processes > 1
    ):
        # Single-process run: nothing to initialize — and nothing JAX is
        # touched, so a LATER explicit initialize() in the same process
        # still works (the backend is not yet instantiated).
        return 0

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_index()


def local_rows(n_global: int) -> tuple[int, int]:
    """This process's (start, stop) row range of an evenly-split global
    batch.

    Row order matches ``global_batch_from_local`` PROVIDED the mesh was
    built by ``make_mesh``, which orders devices process-contiguously
    (raw ``jax.devices()`` id order interleaves hosts on real TPU
    topologies, e.g. v5e-16 host 0 owns ids {0, 1, 4, 5}).  Divisibility
    is checked against the DEVICE count — the stricter requirement the
    downstream 'data'-axis sharding imposes.
    """
    n_dev = jax.device_count()
    if n_global % n_dev:
        raise ValueError(
            f"global batch of {n_global} rows does not shard evenly over "
            f"{n_dev} devices; pad first (parallel.pad_to_multiple)"
        )
    n_proc = jax.process_count()
    per = n_global // n_proc
    i = jax.process_index()
    return i * per, (i + 1) * per


def global_batch_from_local(x_local: Any, mesh: Mesh) -> Any:
    """Assemble per-process local rows into a global batch-sharded array.

    Each process passes only its own rows (same count everywhere); the
    result behaves as one global jax.Array of shape
    (n_processes * local_rows, ...) sharded over the mesh 'data' axis.  No
    host ever materializes the full batch.  Single-process: equivalent to
    ``shard_batch``.
    """
    sharding = NamedSharding(mesh, P("data"))
    n_proc = jax.process_count()

    def one(a):
        # rank-0 leaves pass through like shard_batch (the documented
        # equivalence); arrays go straight in — no np.asarray round-trip
        # of already-device-resident leaves
        if not (hasattr(a, "ndim") and np.ndim(a)):
            return a
        shape = np.shape(a)
        global_shape = (shape[0] * n_proc,) + shape[1:]
        return jax.make_array_from_process_local_data(sharding, a, global_shape)

    return jax.tree_util.tree_map(one, x_local)
