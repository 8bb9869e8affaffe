"""Train + commit the flow and symplectic benchmark checkpoints.

Round-4 VERDICT weak #6: the flow family's headline rate ran the
reference's loose 1e-4 demo protocol and symplectic had no
accuracy-vs-f64 row at all — no committed fields existed for either, so
no strict frontier could be measured or gated.  This script produces

  * ``benchmarks/flow_ckpt.npz`` — ODEFlow[128,128] trained with the
    examples/demo_flow.py protocol (REFERENCE_GMM, same PRNG-key layout,
    staged FM schedule), and
  * ``benchmarks/symplectic_ckpt.npz`` — SymplecticFlowModel[128,128]
    with the examples/demo_symplectic.py protocol (DEMO_GMM, EMA),

each with provenance + save-time quality meta, to be scored by
``benchmarks/bench_flow_sym_frontier.py`` (mode x tolerance x f64@1e-8
oracle) and pinned by the tests/test_checkpoint_quality.py gates.

Run:  python benchmarks/make_flow_symplectic_ckpts.py [--family flow|
          symplectic|both] [--epochs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

FLOW_PATH = os.path.join(_HERE, "flow_ckpt.npz")
SYM_PATH = os.path.join(_HERE, "symplectic_ckpt.npz")


def _commit():
    from benchmarks.bench_suite import git_commit

    return git_commit()


def _save(path, model, extra):
    from flowfusion_tpu.utils.checkpoint import save_npz

    extra = {
        **extra,
        "trained_on_backend": jax.default_backend(),
        "jax_version": jax.__version__,
        "git_commit": _commit(),
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    save_npz(path, model, extra=extra)
    print(f"written: {path}")


def make_flow(epochs: int):
    """EXACT mirror of examples/demo_flow.py (full schedule)."""
    from flowfusion_tpu.models.flow import ODEFlow
    from flowfusion_tpu.train import fit
    from flowfusion_tpu.utils.data import (
        REFERENCE_GMM,
        standardization_stats,
        train_val_test_split,
    )

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_smp = jax.random.split(key, 5)
    x = REFERENCE_GMM.sample(k_data, 50_000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)
    flow = ODEFlow.create(
        k_net, target_dimension=2, hidden_units=(128, 128),
        target_shift=shift, target_scale=scale,
    )

    def fm_loss(model, k, xb, cond):
        return model.flow_matching_loss(k, xb, cond)

    stages = ((32, 1e-3), (64, 1e-4), (128, 1e-5), (256, 1e-6))
    t0 = time.time()
    flow, _ = fit(
        flow, k_fit, x_train, x_val=x_val, stages=stages,
        epochs_per_stage=epochs, loss_fn=fm_loss,
        log_every=max(1, epochs // 5),
    )
    train_s = time.time() - t0

    x_eval = x_test[:25_000]
    lp, _ = flow.log_prob(x_eval, atol=1e-4, rtol=1e-4)
    truth = float(jnp.sum(REFERENCE_GMM.log_prob(x_eval)))
    rel = abs(float(jnp.sum(lp)) - truth) / abs(truth)
    print(f"flow: {train_s:.0f}s train, demo-protocol density error {rel:.4%}")
    _save(FLOW_PATH, flow, {
        "family": "flow",
        "protocol": {"data": "REFERENCE_GMM", "n": 50_000,
                     "stages": [list(s) for s in stages],
                     "epochs_per_stage": epochs},
        "density_rel_error_exact_1e-4": rel,
        "train_seconds": round(train_s, 1),
    })
    return rel


def make_symplectic(epochs: int):
    """EXACT mirror of examples/demo_symplectic.py (full schedule)."""
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel
    from flowfusion_tpu.train import fit
    from flowfusion_tpu.utils.data import (
        DEMO_GMM,
        standardization_stats,
        train_val_test_split,
    )

    key = jax.random.PRNGKey(0)
    k_data, k_split, k_net, k_fit, k_smp, k_lp = jax.random.split(key, 6)
    x = DEMO_GMM.sample(k_data, 50_000)
    x_train, x_val, x_test = train_val_test_split(k_split, x)
    shift, scale = standardization_stats(x_train)
    model = SymplecticFlowModel.create(
        k_net, n_data_dims=2, units=(128, 128), shift=shift, scale=scale,
    )

    def sym_loss(m, k, xb, cond):
        return m.loss_fn(k, xb, cond)

    stages = ((128, 1e-3), (256, 3e-4), (512, 1e-4))
    t0 = time.time()
    model, _ = fit(
        model, k_fit, x_train, x_val=x_val, stages=stages,
        epochs_per_stage=epochs, loss_fn=sym_loss,
        log_every=max(1, epochs // 3), ema_decay=0.999,
    )
    train_s = time.time() - t0

    x_eval = x_test[:25_000]
    lp, _ = model.log_prob(k_lp, x_eval, atol=1e-5, rtol=1e-5)
    truth = float(jnp.sum(DEMO_GMM.log_prob(x_eval)))
    rel = abs(float(jnp.sum(lp)) - truth) / abs(truth)
    print(f"symplectic: {train_s:.0f}s train, IWAE-1 bound gap {rel:.4%}")
    _save(SYM_PATH, model, {
        "family": "symplectic",
        "protocol": {"data": "DEMO_GMM", "n": 50_000,
                     "stages": [list(s) for s in stages],
                     "epochs_per_stage": epochs, "ema_decay": 0.999},
        # NOT a density error: the symplectic log_prob is a K-sample
        # IWAE bound on the momentum marginal (reference
        # symplectic.py:245-249) — this figure includes the bound gap.
        # Solver accuracy is gated separately vs the matched-draw f64
        # oracle (flow_sym_frontier.json / test_checkpoint_quality).
        "iwae1_bound_rel_error_1e-5": rel,
        "train_seconds": round(train_s, 1),
    })
    return rel


def load_flow_model(path: str = FLOW_PATH):
    from flowfusion_tpu.models.flow import ODEFlow
    from flowfusion_tpu.utils.checkpoint import load_npz, read_npz_extra

    template = ODEFlow.create(
        jax.random.PRNGKey(0), target_dimension=2, hidden_units=(128, 128),
    )
    return load_npz(path, template), read_npz_extra(path)


def load_symplectic_model(path: str = SYM_PATH):
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel
    from flowfusion_tpu.utils.checkpoint import load_npz, read_npz_extra

    template = SymplecticFlowModel.create(
        jax.random.PRNGKey(0), n_data_dims=2, units=(128, 128),
    )
    return load_npz(path, template), read_npz_extra(path)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="both",
                    choices=("flow", "symplectic", "both"))
    ap.add_argument("--epochs", type=int, default=None,
                    help="epochs per stage (default: each demo's full "
                    "schedule — flow 250, symplectic 300)")
    args = ap.parse_args()

    out = {}
    if args.family in ("flow", "both"):
        out["flow_rel_error"] = make_flow(args.epochs or 250)
    if args.family in ("symplectic", "both"):
        out["symplectic_rel_error"] = make_symplectic(args.epochs or 300)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
