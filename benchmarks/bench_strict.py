"""Strict-parity throughput at the saturating 1M-row batch.

The suite (bench_suite.py) measures every mode at the reference's 50k
batch; throughput saturates around 1M rows (better HBM utilization per
dispatch, same work per point), and the north-star joint claim — >=1e6
evals/s in a mode whose densities are measured <=1e-4 (mean) from the
f64@1e-8 ground truth — is a 1M-batch claim.  This script measures
exactly those modes at 1M rows on the committed flagship field and
writes ``benchmarks/strict_1m.json`` with provenance.

Accuracy side of the claim: tests/test_checkpoint_quality.py pins each
mode's mean/max |dlogp| vs the f64 oracle on the committed field
(dopri5 @ 1.5e-6 PI is the cheapest ROBUSTLY-strict mode: worst-draw
mean 6.2e-5 / max 3.9e-4 over four independent 64-row draws).

Run (real TPU):  python benchmarks/bench_strict.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

MODES = [
    # (row name, method, rtol=atol, options)
    ("strict/dopri5-1.5e-6", "dopri5", 1.5e-6, {"controller": "pi"}),
    ("strict/dopri5-1e-6", "dopri5", 1e-6, {"controller": "pi"}),
    ("strict/tsit5-1e-6", "tsit5", 1e-6, {"controller": "pi"}),
    ("strict/dop853-1e-5", "dop853", 1e-5, {"controller": "pi", "beta": 0.04}),
    ("headline/dopri5-1e-5", "dopri5", 1e-5, {"controller": "pi"}),
]


def main():
    from bench import _enable_compile_cache, build_trained_model
    from benchmarks.bench_suite import provenance_meta, repeat_slope, stack_of

    _enable_compile_cache()

    model, x, _ = build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    model = dataclasses.replace(
        model, trace_mode="hutchinson", use_fused_kernel=True,
        kernel_compute_dtype="highf32",
    )
    x_big = jnp.tile(x, (20, 1))
    n = x_big.shape[0]

    results = {}
    for seed, (name, method, tol, opts) in enumerate(MODES):
        per_solve = (
            lambda xx, kk, method=method, tol=tol, opts=opts: model.log_prob(
                xx, key=kk, atol=tol, rtol=tol, method=method, options=opts
            )[0]
        )
        t = repeat_slope(
            per_solve, stack_of(x_big, 700 + 100 * seed), k2=2, reps=3
        )
        if t <= 0:
            print(f"{name}: noise-bound slope, skipped", file=sys.stderr)
            continue
        results[name] = {"seconds": round(t, 4), "rate": round(n / t, 1)}
        print(f"{name:26s} {t:7.3f}s   {n/t:>12,.0f}/s", flush=True)

    out = {
        "meta": provenance_meta(
            batch=n,
            kernel="fused V4 highf32 Hutchinson RHS",
            accuracy_contract="tests/test_checkpoint_quality.py "
            "(mean<=1e-4, max<=5e-4 vs f64@1e-8 oracle for strict/* rows)",
        ),
        "results": results,
    }
    path = os.path.join(_HERE, "strict_1m.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
