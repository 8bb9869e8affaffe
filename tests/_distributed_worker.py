"""Worker process for the 2-process distributed integration test.

Launched by ``test_distributed_multiprocess.py`` as
``python _distributed_worker.py <pid> <nproc> <port> <outdir> [devs_per_proc]``
(devs_per_proc defaults to 4: 2 processes x 4 devices; the 8x1 variant
exercises one-device-per-host pod topology where EVERY collective crosses
the process boundary).

Each process initializes the JAX distributed runtime over localhost,
holds only ITS OWN rows of a deterministic global batch, and runs the
framework's documented pod-slice recipe (distributed.py module
docstring): ``initialize_distributed`` -> ``make_mesh`` ->
``global_batch_from_local`` -> ``data_parallel`` solves.  Process 0
writes the (replicated) results for the parent test to compare against
a single-process oracle on the same 8-device total.
"""

import os
import sys


def main() -> None:
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    devs_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    )

    import jax

    # sitecustomize may have imported jax already with the axon platform
    # preferred and env-derived defaults snapshotted — repoint explicitly
    # (same pattern as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from flowfusion_tpu.parallel import (
        data_parallel,
        data_parallel_per_shard,
        global_batch_from_local,
        initialize_distributed,
        local_rows,
        make_mesh,
    )

    got_pid = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert got_pid == pid, (got_pid, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == devs_per_proc * nproc, jax.device_count()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.utils.data import DEMO_GMM

    cfg = ScoreMLPConfig(n_dimensions=2, units=(32, 32))
    model = ScoreModel(
        params=init_score_mlp(jax.random.PRNGKey(0), cfg), net=cfg, sde=VESDE()
    )

    n_global = 64
    x_full = np.asarray(DEMO_GMM.sample(jax.random.PRNGKey(1), n_global))
    start, stop = local_rows(n_global)
    assert stop - start == n_global // nproc, (start, stop)

    mesh = make_mesh()
    xg = global_batch_from_local(x_full[start:stop], mesh)

    # Rendezvous discipline for many-process single-core runs: gloo's
    # key-value window for creating the collectives context is a fixed
    # 30 s, but 8 jax processes timesharing one CPU can spread their
    # first dispatch over minutes (imports + tracing + compiles are
    # serialized by the scheduler).  So (1) AOT-compile a minimal
    # all-reduce — compilation needs no gloo context — then (2) meet at
    # a coordination-service barrier (generous, configurable timeout),
    # then (3) dispatch immediately: every process reaches the gloo
    # rendezvous within dispatch skew, not compile skew.
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

    warm = (
        jax.jit(
            lambda a: jnp.sum(a),
            in_shardings=_NS(mesh, _P("data")),
            out_shardings=_NS(mesh, _P()),
        )
        .lower(jax.ShapeDtypeStruct(xg.shape, xg.dtype))
        .compile()
    )
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("flowfusion-warmup", 600_000)
    np.asarray(warm(xg))  # first collective: gloo context created here

    # batch-global likelihood solve: the adaptive error norm psums over
    # both hosts' shards every accepted/rejected step
    lp = data_parallel(
        lambda b: model.log_prob(b, key=jax.random.PRNGKey(7))[0], mesh
    )(xg)

    # per-shard likelihood solve (the pod-slice deployment path for the
    # fused kernels): each of the 8 shards steps on its own adaptive
    # clock with NO collectives — shard boundaries are identical to the
    # parent's single-process 8-device run, so results must match it
    lp_ps = data_parallel_per_shard(
        lambda b: model.log_prob(b, key=jax.random.PRNGKey(7))[0], mesh
    )(xg)

    # DSM gradient: loss divides by the GLOBAL batch, so grads must match
    # a single-process run on the same global rows
    def grads_fn(b):
        def loss(p):
            m = dataclasses.replace(model, params=p)
            return m.loss_fn(jax.random.PRNGKey(3), b)

        return jax.grad(loss)(model.params)

    grads = data_parallel(grads_fn, mesh)(xg)

    # replicate so every process can read full values locally
    rep = jax.jit(
        lambda t: t,
        out_shardings=jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), (lp, lp_ps, grads)
        ),
    )
    lp_r, lp_ps_r, grads_r = rep((lp, lp_ps, grads))
    if pid == 0:
        flat = {
            f"g{i}": np.asarray(g)
            for i, g in enumerate(jax.tree_util.tree_leaves(grads_r))
        }
        np.savez(
            os.path.join(outdir, "worker0.npz"),
            lp=np.asarray(lp_r),
            lp_ps=np.asarray(lp_ps_r),
            **flat,
        )
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
