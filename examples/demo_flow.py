"""End-to-end flow-matching workflow on the 2-D GMM (demo_flow.ipynb parity).

Train a rectified-flow CNF with the conditional flow-matching loss, sample
by integrating the learned ODE backwards in time, and validate the exact
log-likelihood against the analytic mixture density.

Run:  python examples/demo_flow.py [--quick]
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
import time

import jax
import jax.numpy as jnp

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import (
    REFERENCE_GMM,
    standardization_stats,
    train_val_test_split,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=50_000)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_smp = jax.random.split(key, 5)

    x = REFERENCE_GMM.sample(k_data, args.n if not args.quick else 4000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)

    flow = ODEFlow.create(
        k_net,
        target_dimension=2,
        hidden_units=(128, 128),
        target_shift=shift,
        target_scale=scale,
    )

    def fm_loss(model, k, xb, cond):
        return model.flow_matching_loss(k, xb, cond)

    if args.quick:
        stages, epochs = ((32, 1e-3), (64, 1e-4)), 10
    else:
        stages, epochs = ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6)), 250
    flow, _ = fit(
        flow,
        k_fit,
        x_train,
        x_val=x_val,
        stages=stages,
        epochs_per_stage=epochs,
        loss_fn=fm_loss,
        log_every=max(1, epochs // 5),
    )

    n_s = 2000 if args.quick else 25_000
    xT = jax.random.normal(k_smp, (n_s, 2))
    t0 = time.time()
    samples, _ = flow.sample(xT)
    jax.block_until_ready(samples)
    print(f"CNF sampling ({n_s}): {time.time()-t0:.2f}s")

    x_eval = x_test[:n_s]
    truth = float(jnp.sum(REFERENCE_GMM.log_prob(x_eval)))
    t0 = time.time()
    lp, stats = flow.log_prob(x_eval, atol=1e-4, rtol=1e-4)
    jax.block_until_ready(lp)
    print(
        f"flow log_prob: {time.time()-t0:.2f}s sum={float(jnp.sum(lp)):.2f} "
        f"(truth {truth:.2f}) rhs_evals={int(jnp.sum(stats.n_func_evals))}"
    )
    rel = abs(float(jnp.sum(lp)) - truth) / abs(truth)
    print(f"relative error {rel:.4%}")


if __name__ == "__main__":
    main()
