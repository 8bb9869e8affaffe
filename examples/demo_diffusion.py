"""End-to-end diffusion workflow on the 2-D GMM (reference demo parity).

Script port of demo_diffusion.ipynb: sample the mixture, train a VESDE
score model with staged DSM training, sample via SDE and probability-flow
ODE, and compare the four log-prob strategies against the analytic density.

Run (any backend):  python examples/demo_diffusion.py [--quick]
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

from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
from flowfusion_tpu.models.population import PopulationModelDiffusion
from flowfusion_tpu.models.score import ScoreModel
from flowfusion_tpu.ops.sde import VESDE
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import (
    REFERENCE_GMM,
    standardization_stats,
    train_val_test_split,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small run for smoke testing")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument(
        "--tpu-schedule",
        action="store_true",
        help="large-batch staged schedule + EMA (reaches ~0.1%% density "
        "error in ~500 s on one v5e core; the default mirrors the "
        "reference notebook's small-batch schedule)",
    )
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_smp, k_lp = jax.random.split(key, 6)

    # --- data (notebook cell 2-5) -------------------------------------
    x = REFERENCE_GMM.sample(k_data, args.n if not args.quick else 4000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)

    # --- model --------------------------------------------------------
    sde = VESDE()
    model = PopulationModelDiffusion.create(
        k_net, sde, n_dimensions=2, units=(128, 128, 128), shift=shift, scale=scale
    )

    # --- staged training (notebook cell 6) ----------------------------
    if args.quick:
        stages, epochs, ema = ((32, 1e-3), (64, 1e-4)), 10, None
    elif args.tpu_schedule:
        stages = ((128, 1e-3), (256, 3e-4), (512, 1e-4), (512, 3e-5), (512, 1e-5))
        epochs, ema = 400, 0.999
    else:
        stages = ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6))
        epochs, ema = 250, None
    model, results = fit(
        model,
        k_fit,
        x_train,
        x_val=x_val,
        stages=stages,
        epochs_per_stage=epochs,
        log_every=max(1, epochs // 5),
        ema_decay=ema,
    )

    # --- sampling (cells 9-12) ----------------------------------------
    n_s = 2000 if args.quick else 50_000
    t0 = time.time()
    samples_sde = model.sample_sde(k_smp, (n_s, 2))
    jax.block_until_ready(samples_sde)
    print(f"SDE sampling ({n_s}): {time.time()-t0:.2f}s")

    base = jax.random.normal(jax.random.PRNGKey(7), (n_s, 2))
    t0 = time.time()
    samples_ode, _ = model.forward(base)
    jax.block_until_ready(samples_ode)
    print(f"ODE sampling ({n_s}): {time.time()-t0:.2f}s")

    # --- log-prob strategy comparison (cells 13-17) --------------------
    x_eval = x_test[: (2000 if args.quick else 50_000)]
    truth = float(jnp.sum(REFERENCE_GMM.log_prob(x_eval)))
    report = {"truth": truth}
    for mode in ("exact", "hutchinson", "hutchpp", "xtrace"):
        m = dataclasses.replace(
            model,
            score_model=dataclasses.replace(
                model.score_model, trace_mode=mode, hpp_rank=1, hpp_vecs=1, xt_vecs=2
            ),
        )
        t0 = time.time()
        lp, stats = m.log_prob(
            x_eval, key=k_lp, atol=1e-4, rtol=1e-4, volume_corrected=True
        )
        jax.block_until_ready(lp)
        dt = time.time() - t0
        report[mode] = float(jnp.sum(lp))
        print(
            f"log_prob[{mode:10s}]: {dt:6.2f}s  sum={report[mode]:.2f} "
            f"(truth {truth:.2f})  rhs_evals={int(jnp.sum(stats.n_func_evals))}"
        )

    for mode in ("exact", "hutchinson", "hutchpp", "xtrace"):
        rel = abs(report[mode] - truth) / abs(truth)
        print(f"{mode}: relative error {rel:.4%}")


if __name__ == "__main__":
    main()
