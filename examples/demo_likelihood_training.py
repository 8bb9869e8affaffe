"""Maximum-likelihood CNF training through the adjoint solve.

The reference enables training *through* the ODE solver via
``torchdiffeq.odeint_adjoint`` (flow.py:357-382 selects it with the
``adjoint`` flag; diffusion.py:620-629 with ``self.training``) but never
demonstrates it — its demos train by flow matching only.  This example
shows the TPU-native equivalent end-to-end:

  1. pre-train an ``ODEFlow`` with the (cheap, simulation-free)
     flow-matching loss;
  2. fine-tune by directly maximizing the exact CNF log-likelihood,
     differentiating through the adaptive dopri5 solve with the
     O(1)-memory continuous adjoint (``log_prob(..., adjoint=True)``);
  3. report the summed test log-density against the analytic mixture
     before and after.

MLE fine-tuning optimizes the actual density-estimation objective, so a
few hundred steps typically tighten the density error the FM objective
leaves behind.

Run:  python examples/demo_likelihood_training.py [--quick]
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
import optax

from flowfusion_tpu.models.flow import ODEFlow
from flowfusion_tpu.train import fit
from flowfusion_tpu.utils.data import (
    DEMO_GMM,
    standardization_stats,
    train_val_test_split,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--mle-steps", type=int, default=300)
    ap.add_argument("--mle-batch", type=int, default=1024)
    ap.add_argument("--mle-lr", type=float, default=3e-5)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_mle = jax.random.split(key, 5)

    x = DEMO_GMM.sample(k_data, args.n if not args.quick else 4000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)

    flow = ODEFlow.create(
        k_net,
        target_dimension=2,
        hidden_units=(128, 128),
        target_shift=shift,
        target_scale=scale,
    )

    # --- stage 1: flow-matching pre-training ---------------------------
    def fm_loss(model, k, xb, cond):
        return model.flow_matching_loss(k, xb, cond)

    stages = ((64, 1e-3),) if args.quick else ((64, 1e-3), (128, 3e-4))
    epochs = 10 if args.quick else 150
    flow, _ = fit(
        flow, k_fit, x_train, x_val=x_val, stages=stages,
        epochs_per_stage=epochs, loss_fn=fm_loss, log_every=max(1, epochs // 3),
    )

    x_eval = x_test[: (2000 if args.quick else 25_000)]
    truth = float(jnp.sum(DEMO_GMM.log_prob(x_eval)))

    def density_report(tag):
        lp, _ = flow.log_prob(x_eval, atol=1e-4, rtol=1e-4)
        s = float(jnp.sum(lp))
        rel = abs(s - truth) / abs(truth)
        print(f"{tag}: sum log p = {s:.2f} (truth {truth:.2f}), rel err {rel:.4%}")
        return rel

    rel_before = density_report("after flow matching     ")

    # --- stage 2: exact-likelihood fine-tuning through the adjoint -----
    mle_steps = 30 if args.quick else args.mle_steps
    tx = optax.adam(args.mle_lr)
    opt_state = tx.init(flow.params)

    @jax.jit
    def mle_step(params, opt_state, xb):
        def loss_fn(p):
            m = dataclasses.replace(flow, params=p)
            # Looser tolerances are fine for a *gradient*: the adjoint is
            # consistent at any tolerance; evaluation below stays at 1e-4.
            lp, _ = m.log_prob(xb, atol=1e-3, rtol=1e-3, adjoint=True)
            return -jnp.mean(lp)

        nll, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, nll

    params = flow.params
    t0 = time.time()
    for i in range(mle_steps):
        k_mle, kb = jax.random.split(k_mle)
        idx = jax.random.randint(kb, (args.mle_batch,), 0, x_train.shape[0])
        params, opt_state, nll = mle_step(params, opt_state, x_train[idx])
        if i % max(1, mle_steps // 5) == 0:
            print(f"  MLE step {i:4d}: nll/point = {float(nll):.4f}")
    print(f"MLE fine-tune wall-clock: {time.time()-t0:.1f}s ({mle_steps} steps)")
    flow = dataclasses.replace(flow, params=params)

    rel_after = density_report("after MLE fine-tuning   ")
    print(f"density error: {rel_before:.4%} -> {rel_after:.4%}")


if __name__ == "__main__":
    main()
