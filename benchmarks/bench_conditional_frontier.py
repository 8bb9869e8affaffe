"""Conditional-flagship accuracy frontier: mode x tolerance x f64 oracle.

The round-4 VERDICT's core gap: the north-star workload (BASELINE.json
configs[4], conditional 6-D/3-cond density estimation) had no strict
rows — all strict/frontier machinery existed only for the 2-D
unconditional flagship.  This script runs the same battery for the
committed conditional checkpoint(s):

  * f64@1e-8 ground truth per eval draw (tests/oracles.py
    ``vpsde_cond_likelihood_rhs_f64`` — an independent NumPy float64
    dopri5 on the exact conditional probability-flow RHS);
  * tolerance ladder x trace mode (exact / hutchinson / hutchpp /
    xtrace), dopri5 with the PI controller (the serving protocol);
  * FOUR independent 64-row draws per cell — the strict bar is
    WORST-draw mean <=1e-4 / max <=5e-4, the same contract the 2-D
    flagship gate pins (tests/test_checkpoint_quality.py);
  * quality vs the analytic family (bias/scatter in nats, 50k rows) —
    training quality, distinct from solver accuracy.

CPU-runnable (accuracy only — rates come from bench_strict.py's
conditional rows on the real chip).  Writes
``benchmarks/conditional_frontier.json`` with provenance.

Run:  python benchmarks/bench_conditional_frontier.py [--units 128]
          [--draws 4] [--rows 64]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

# (cell name, trace_mode, method, rtol=atol, options)
LADDER = [
    ("exact/dopri5-1e-4", "exact", "dopri5", 1e-4, {"controller": "pi"}),
    ("exact/dopri5-1e-5", "exact", "dopri5", 1e-5, {"controller": "pi"}),
    ("exact/dopri5-3e-6", "exact", "dopri5", 3e-6, {"controller": "pi"}),
    ("exact/dopri5-1.5e-6", "exact", "dopri5", 1.5e-6, {"controller": "pi"}),
    ("exact/dopri5-1e-6", "exact", "dopri5", 1e-6, {"controller": "pi"}),
    ("exact/tsit5-1e-6", "exact", "tsit5", 1e-6, {"controller": "pi"}),
    ("exact/dop853-1e-5", "exact", "dop853", 1e-5,
     {"controller": "pi", "beta": 0.04}),
    ("exact/dop853-3e-6", "exact", "dop853", 3e-6,
     {"controller": "pi", "beta": 0.04}),
    ("hutch/dopri5-1e-5", "hutchinson", "dopri5", 1e-5, {"controller": "pi"}),
    ("hutch/dopri5-1.5e-6", "hutchinson", "dopri5", 1.5e-6,
     {"controller": "pi"}),
    ("hutchpp/dopri5-1.5e-6", "hutchpp", "dopri5", 1.5e-6,
     {"controller": "pi"}),
    ("xtrace/dopri5-1.5e-6", "xtrace", "dopri5", 1.5e-6,
     {"controller": "pi"}),
]


def f64_truth(inner, x_std, cond_n):
    """f64@1e-8 log-prob (standardized units) + oracle NFE."""
    from oracles import (
        numpy_dopri5,
        std_normal_logprob_f64,
        vpsde_cond_likelihood_rhs_f64,
    )

    B, D = x_std.shape
    sde = inner.sde
    rhs = vpsde_cond_likelihood_rhs_f64(
        inner.params, cond_n,
        beta_min=sde.beta_min, beta_max=sde.beta_max, T=sde.T,
    )(D)
    y0 = np.concatenate([np.asarray(x_std, np.float64).ravel(), np.zeros(B)])
    yT, nfe = numpy_dopri5(
        rhs, y0, [float(sde.epsilon), 1.0], rtol=1e-8, atol=1e-8
    )
    yT = yT[-1]
    lp = yT[B * D:] + std_normal_logprob_f64(yT[: B * D].reshape(B, D))
    return lp, int(nfe)


def main():
    import argparse

    from benchmarks.bench_suite import provenance_meta
    from benchmarks.make_conditional_ckpt import load_conditional_model
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=128, choices=(128, 256))
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--quality-rows", type=int, default=50_000)
    args = ap.parse_args()

    model, meta = load_conditional_model(units=args.units)
    inner = model.score_model

    # -- per-draw f64 ground truths (standardized units) -----------------
    draws = []
    for i in range(args.draws):
        theta, c = CONDITIONAL_POP.sample(
            jax.random.PRNGKey(100 + i), args.rows
        )
        x_std = np.asarray((theta - model.shift) / model.scale, np.float64)
        cond_n = np.asarray(model._norm_cond(c), np.float64)
        truth, nfe = f64_truth(inner, x_std, cond_n)
        draws.append((x_std, cond_n, truth, nfe))
        print(f"draw {i}: f64@1e-8 oracle NFE={nfe}", flush=True)

    # -- ladder cells ----------------------------------------------------
    cells = {}
    for name, trace, method, tol, opts in LADDER:
        m = dataclasses.replace(inner, trace_mode=trace)
        per_draw = []
        for j, (x_std, cond_n, truth, _) in enumerate(draws):
            lp, st = m.log_prob(
                jnp.asarray(x_std, jnp.float32),
                conditional=jnp.asarray(cond_n, jnp.float32),
                key=jax.random.PRNGKey(7 + j),
                atol=tol, rtol=tol, method=method, options=dict(opts),
            )
            d = np.abs(np.asarray(lp, np.float64) - truth)
            per_draw.append({
                "mean": float(d.mean()),
                "max": float(d.max()),
                "signed_mean": float(
                    np.mean(np.asarray(lp, np.float64) - truth)
                ),
                "nfe": int(np.max(np.asarray(st.n_func_evals))),
            })
        worst_mean = max(p["mean"] for p in per_draw)
        worst_max = max(p["max"] for p in per_draw)
        cells[name] = {
            "worst_draw_mean_dlogp": worst_mean,
            "worst_draw_max_dlogp": worst_max,
            "nfe": max(p["nfe"] for p in per_draw),
            "strict": bool(worst_mean <= 1e-4 and worst_max <= 5e-4),
            "per_draw": per_draw,
        }
        print(
            f"{name:24s} worst mean {worst_mean:.2e} max {worst_max:.2e} "
            f"nfe {cells[name]['nfe']:4d} "
            f"{'STRICT' if cells[name]['strict'] else ''}",
            flush=True,
        )

    # -- training quality vs the analytic family -------------------------
    theta_q, c_q = CONDITIONAL_POP.sample(
        jax.random.PRNGKey(9), args.quality_rows
    )
    lp_q, _ = model.log_prob(
        theta_q, conditional=c_q, key=jax.random.PRNGKey(1),
        atol=1e-5, rtol=1e-5, volume_corrected=True,
        options={"controller": "pi"},
    )
    truth_q = CONDITIONAL_POP.log_prob(theta_q, c_q)
    bias = float(jnp.mean(lp_q - truth_q))
    rmse = float(jnp.sqrt(jnp.mean((lp_q - truth_q - bias) ** 2)))
    print(f"quality vs analytic (hutch@1e-5 PI, {args.quality_rows} rows): "
          f"offset {bias:+.4f} nats, scatter {rmse:.4f} nats")

    out_path = os.path.join(
        _HERE,
        "conditional_frontier.json" if args.units == 128
        else "conditional_frontier_h256.json",
    )
    out = {
        "meta": provenance_meta(
            workload="BASELINE configs[4]: conditional 6-D/3-cond "
            f"population density, MLP[{args.units}]x3, VP-SDE no_sigma",
            checkpoint=meta.get("git_commit"),
            draws=args.draws, rows_per_draw=args.rows,
            oracle="NumPy f64 dopri5 @1e-8 on the exact conditional "
            "probability-flow RHS (tests/oracles.py)",
            oracle_nfe=[d[3] for d in draws],
            strict_bar="worst-draw mean<=1e-4 AND max<=5e-4 "
            "(the 2-D flagship gate's contract)",
        ),
        "cells": cells,
        "quality_vs_analytic": {
            "offset_nats": bias, "scatter_nats": rmse,
            "protocol": "hutchinson@1e-5 PI volume_corrected (the demo/"
            "BASELINE serving protocol), 50k fresh rows",
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
