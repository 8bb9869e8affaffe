"""Conditional population-model demo at scale (Alsing+2024-style workload).

Synthetic stand-in for SPS/SED population posteriors: physical parameters
theta (6-D) whose conditional distribution p(theta | c) given observables c
(3-D) is a curved, heteroscedastic family.  Train a conditional diffusion
model and evaluate batch-sharded conditional densities for 1e6 points —
BASELINE.json configs[4].

Run:  python examples/demo_conditional_population.py [--quick]
"""

from __future__ import annotations

import os
import sys

# Allow running straight from a source checkout: the package lives one
# directory up from this script and is not necessarily pip-installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honour JAX_PLATFORMS if the user set it (this sandbox's sitecustomize
# force-prefers its TPU relay over the env var, same workaround as
# bench.py) — must run before the first jax device query.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from flowfusion_tpu.models.population import PopulationModelDiffusion
from flowfusion_tpu.ops.sde import VPSDE
from flowfusion_tpu.parallel.sharding import make_mesh, pad_to_multiple, shard_batch
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import standardization_stats

from flowfusion_tpu.utils.data import CONDITIONAL_POP

THETA_DIM, COND_DIM = CONDITIONAL_POP.theta_dim, CONDITIONAL_POP.cond_dim


def synthetic_population(key, n):
    """theta | c draws + analytic (mean, scale) — the shared
    ``utils.data.ConditionalPopulation`` oracle (promoted there in
    round 5 so the committed conditional checkpoints, the strict bench,
    and the quality gate all score against ONE frozen family)."""
    theta, c = CONDITIONAL_POP.sample(key, n)
    return theta, c, CONDITIONAL_POP.mean_scale(c)


def analytic_log_prob(theta, mean, scale):
    return jnp.sum(
        -0.5 * ((theta - mean) / scale) ** 2
        - jnp.log(scale)
        - 0.5 * jnp.log(2 * jnp.pi),
        axis=1,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n-train", type=int, default=200_000)
    ap.add_argument("--n-eval", type=int, default=1_000_000)
    args = ap.parse_args()
    if args.quick:
        args.n_train, args.n_eval = 8000, 20_000

    key = jax.random.PRNGKey(0)
    k_data, k_net, k_fit, k_eval = jax.random.split(key, 4)

    theta, c, _ = synthetic_population(k_data, args.n_train)
    shift, scale = standardization_stats(theta)
    c_shift, c_scale = standardization_stats(c)

    model = PopulationModelDiffusion.create(
        k_net,
        VPSDE(),
        n_dimensions=THETA_DIM,
        n_conditionals=COND_DIM,
        units=(128, 128, 128),
        shift=shift,
        scale=scale,
        conditional_shift=c_shift,
        conditional_scale=c_scale,
        no_sigma=True,
        trace_mode="hutchinson",
        # Serving mode: the 3-pass split-dot + tanh-sigmoid kernel —
        # parity-grade at rtol=1e-5 (identical solver step counts, mean
        # |dlogp| ~7e-5 vs plain XLA; BENCHMARKS.md) and the bench.py
        # headline configuration.  Training is unaffected (the DSM loss
        # runs plain XLA regardless).
        kernel_compute_dtype="highf32",
    )

    epochs = 5 if args.quick else 60
    model, _ = fit(
        model,
        k_fit,
        theta,
        conditional_train=c,
        stages=((256, 1e-3), (512, 3e-4)),
        epochs_per_stage=epochs,
        log_every=max(1, epochs // 3),
    )

    # ---- bulk conditional density evaluation, batch-sharded ------------
    theta_ev, c_ev, (mean_ev, scale_ev) = synthetic_population(
        jax.random.PRNGKey(9), args.n_eval
    )
    mesh = make_mesh()

    def lp_fn(batch):
        th, cc = batch
        lp, _ = model.log_prob(
            th, conditional=cc, key=k_eval, atol=1e-5, rtol=1e-5,
            volume_corrected=True,
            # Lund-stabilized PI step control: same accept test, ~2x fewer
            # rejected steps and better accuracy vs a tight oracle
            # (BENCHMARKS.md) — the serving configuration bench.py uses.
            options={"controller": "pi"},
        )
        return lp

    jfn = jax.jit(lp_fn)
    # pad to the device count so any --n-eval works, slice after
    n_dev = len(mesh.devices.reshape(-1))
    theta_p, n_true = pad_to_multiple(theta_ev, n_dev)
    c_p, _ = pad_to_multiple(c_ev, n_dev)
    batch = (shard_batch(theta_p, mesh), shard_batch(c_p, mesh))
    lp = jfn(batch)[:n_true]  # compile
    jax.block_until_ready(lp)
    # Perturb the timed call's data: the sandbox's remote-execution relay
    # can serve cached results for identical executable+argument pairs.
    batch2 = (batch[0] + 1e-6, batch[1])
    t0 = time.time()
    lp_t = jfn(batch2)[:n_true]
    jax.block_until_ready(lp_t)
    dt = time.time() - t0
    print(f"conditional log_prob: {args.n_eval:,} evals in {dt:.2f}s "
          f"= {args.n_eval/dt:,.0f} evals/s over {len(jax.devices())} device(s)")

    truth = analytic_log_prob(theta_ev, mean_ev, scale_ev)
    bias = float(jnp.mean(lp - truth))
    rmse = float(jnp.sqrt(jnp.mean((lp - truth - bias) ** 2)))
    print(f"vs analytic truth: mean offset {bias:+.3f}, scatter {rmse:.3f} nats")


if __name__ == "__main__":
    main()
