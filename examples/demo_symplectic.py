"""Symplectic (Hamiltonian) generative-flow demo on the 2-D GMM.

Train the divergence-free Hamiltonian model with a joint flow-matching
objective, sample with the one-evaluation Euler fast sampler and with
leapfrog, and evaluate the trace-free log-likelihood against the analytic
mixture (BASELINE.json configs[3]: Toth+2020-style HGN with a symplectic
integrator).

Run:  python examples/demo_symplectic.py [--quick]
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

from flowfusion_tpu.models.symplectic import SymplecticFlowModel
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
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_smp, k_lp = jax.random.split(key, 6)

    x = DEMO_GMM.sample(k_data, args.n if not args.quick else 4000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)

    model = SymplecticFlowModel.create(
        k_net, n_data_dims=2, units=(128, 128), shift=shift, scale=scale
    )

    def sym_loss(m, k, xb, cond):
        return m.loss_fn(k, xb, cond)

    epochs = 10 if args.quick else 300
    stages = ((128, 1e-3),) if args.quick else ((128, 1e-3), (256, 3e-4), (512, 1e-4))
    t0 = time.time()
    model, _ = fit(
        model, k_fit, x_train, x_val=x_val, stages=stages,
        epochs_per_stage=epochs, loss_fn=sym_loss,
        log_every=max(1, epochs // 3), ema_decay=None if args.quick else 0.999,
    )
    print(f"training wall: {time.time()-t0:.0f}s")

    n_s = 2000 if args.quick else 25_000
    for method, steps in (("euler", 1), ("euler", 16), ("leapfrog", 8)):
        t0 = time.time()
        s = model.sample(k_smp, (n_s, 2), num_steps=steps, method=method)
        jax.block_until_ready(s)
        mu = jnp.mean(s, axis=0)
        sd = jnp.std(s, axis=0)
        print(
            f"sample[{method}:{steps:3d}] {time.time()-t0:.2f}s "
            f"mean=({float(mu[0]):+.2f},{float(mu[1]):+.2f}) "
            f"std=({float(sd[0]):.2f},{float(sd[1]):.2f}) "
            f"(data: mean ~(+0.2,+0.2), std ~1.2)"
        )

    x_eval = x_test[:n_s]
    truth = float(jnp.sum(DEMO_GMM.log_prob(x_eval)))
    t0 = time.time()
    lp, stats = model.log_prob(k_lp, x_eval)
    jax.block_until_ready(lp)
    s = float(jnp.sum(lp))
    print(
        f"log_prob (trace-free, single momentum draw): {time.time()-t0:.2f}s "
        f"sum={s:.2f} truth={truth:.2f} rel={(abs(s-truth)/abs(truth)):.3%} "
        f"rhs_evals={int(jnp.sum(stats.n_func_evals))}"
    )
    t0 = time.time()
    lp16, _ = model.log_prob(k_lp, x_eval, n_momentum_samples=16)
    jax.block_until_ready(lp16)
    s16 = float(jnp.sum(lp16))
    print(
        f"log_prob (16 momentum draws, IWAE bound): {time.time()-t0:.2f}s "
        f"sum={s16:.2f} rel={(abs(s16-truth)/abs(truth)):.3%}"
    )
    print(
        "note: the symplectic log_prob is a one-sample bound estimate "
        "(reference symplectic.py:245-249); relative error includes that "
        "marginalization noise, not just model error"
    )


if __name__ == "__main__":
    main()
