"""Flow + symplectic strict frontiers vs their f64@1e-8 oracles.

Round-4 VERDICT weak #6: the diffusion-style frontier (mode x tolerance
x mean/max |dlogp|) did not exist for the other two families — the flow
exact-trace rate row ran the reference's loose 1e-4 demo protocol and
symplectic had no accuracy row at all.  This script measures both, on
the COMMITTED fields (benchmarks/flow_ckpt.npz,
benchmarks/symplectic_ckpt.npz):

  * flow: trace mode (exact / hutchinson) x tolerance ladder, dopri5
    with the PI controller (+ dop853 at 1e-5, the high-accuracy regime),
    against the NumPy f64 dopri5 @1e-8 oracle of the same velocity
    field (tests/oracles.py::flow_likelihood_rhs_f64);
  * symplectic: tolerance ladder only (the field is trace-free by
    construction — there IS no estimator axis), against the f64 joint
    (q, p) integration with the IDENTICAL p0 momentum draw;
  * FOUR independent 64-row draws per cell; strict bar = worst-draw
    mean <= 1e-4 AND max <= 5e-4 (the flagship gate's contract).

CPU-runnable.  Writes ``benchmarks/flow_sym_frontier.json``; the
matching rate rows live in strict_1m.json (bench_strict.py, real TPU);
the gates are tests/test_checkpoint_quality.py::test_flow_checkpoint_*
/ test_symplectic_checkpoint_*.

Run:  python benchmarks/bench_flow_sym_frontier.py [--draws 4] [--rows 64]
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

FLOW_LADDER = [
    ("exact/dopri5-1e-4", "exact", "dopri5", 1e-4, {"controller": "pi"}),
    ("exact/dopri5-1e-5", "exact", "dopri5", 1e-5, {"controller": "pi"}),
    ("exact/dopri5-3e-6", "exact", "dopri5", 3e-6, {"controller": "pi"}),
    ("exact/dopri5-1.5e-6", "exact", "dopri5", 1.5e-6, {"controller": "pi"}),
    ("exact/dopri5-1e-6", "exact", "dopri5", 1e-6, {"controller": "pi"}),
    ("exact/dop853-1e-5", "exact", "dop853", 1e-5,
     {"controller": "pi", "beta": 0.04}),
    ("hutch/dopri5-1e-5", "hutchinson", "dopri5", 1e-5, {"controller": "pi"}),
    ("hutch/dopri5-1.5e-6", "hutchinson", "dopri5", 1.5e-6,
     {"controller": "pi"}),
]

SYM_LADDER = [
    ("dopri5-1e-4", "dopri5", 1e-4, {"controller": "pi"}),
    ("dopri5-1e-5", "dopri5", 1e-5, {"controller": "pi"}),
    ("dopri5-1e-6", "dopri5", 1e-6, {"controller": "pi"}),
    ("dopri5-1e-7", "dopri5", 1e-7, {"controller": "pi"}),
    ("dop853-1e-5", "dop853", 1e-5, {"controller": "pi", "beta": 0.04}),
]


def _cells(per_draw_fn, ladder, draws):
    cells = {}
    for row in ladder:
        name = row[0]
        per_draw = []
        for j, draw in enumerate(draws):
            lp, nfe, truth = per_draw_fn(row, j, draw)
            d = np.abs(np.asarray(lp, np.float64) - truth)
            per_draw.append({
                "mean": float(d.mean()), "max": float(d.max()),
                "nfe": nfe,
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
        print(f"{name:22s} worst mean {worst_mean:.2e} max {worst_max:.2e} "
              f"nfe {cells[name]['nfe']:4d} "
              f"{'STRICT' if cells[name]['strict'] else ''}", flush=True)
    return cells


def flow_frontier(n_draws, rows):
    from oracles import (
        flow_likelihood_rhs_f64,
        numpy_dopri5,
        std_normal_logprob_f64,
    )

    from benchmarks.make_flow_symplectic_ckpts import load_flow_model
    from flowfusion_tpu.utils.data import REFERENCE_GMM

    flow, _ = load_flow_model()
    flow = dataclasses.replace(flow, use_fused_kernel=False)

    draws = []
    for i in range(n_draws):
        x = REFERENCE_GMM.sample(jax.random.PRNGKey(200 + i), rows)
        x_std = (np.asarray(x, np.float64) - np.asarray(flow.target_shift)) \
            / np.asarray(flow.target_scale)
        B, D = x_std.shape
        rhs = flow_likelihood_rhs_f64(flow.params)(D)
        y0 = np.concatenate([x_std.ravel(), np.zeros(B)])
        ys, nst = numpy_dopri5(rhs, y0, [0.0, 1.0], 1e-8, 1e-8)
        yT = ys[-1]
        XT = yT[: B * D].reshape(B, D)
        # standardized-unit truth: ODEFlow.log_prob subtracts
        # sum(log target_scale); do the same so live-vs-oracle compares
        # the full public value
        truth = (
            std_normal_logprob_f64(XT) + yT[B * D:]
            - np.sum(np.log(np.asarray(flow.target_scale, np.float64)))
        )
        draws.append((np.asarray(x, np.float64), truth))
        print(f"flow draw {i}: oracle steps={nst}", flush=True)

    def run(row, j, draw):
        name, trace, method, tol, opts = row
        m = dataclasses.replace(flow, trace_mode=trace)
        x, truth = draw
        lp, st = jax.jit(
            lambda mm, xx, kk: mm.log_prob(
                xx, key=kk, atol=tol, rtol=tol, method=method,
                options=dict(opts),
            )
        )(m, jnp.asarray(x, jnp.float32), jax.random.PRNGKey(60 + j))
        return lp, int(np.max(np.asarray(st.n_func_evals))), truth

    return _cells(run, FLOW_LADDER, draws)


def symplectic_frontier(n_draws, rows):
    from oracles import (
        numpy_dopri5,
        std_normal_logprob_f64,
        symplectic_rhs_f64,
    )

    from benchmarks.make_flow_symplectic_ckpts import load_symplectic_model
    from flowfusion_tpu.utils.data import DEMO_GMM

    model, _ = load_symplectic_model()
    model = dataclasses.replace(model, use_fused_kernel=False)

    draws = []
    for i in range(n_draws):
        x = DEMO_GMM.sample(jax.random.PRNGKey(400 + i), rows)
        k_lp = jax.random.PRNGKey(80 + i)
        q0 = (np.asarray(x, np.float64) - np.asarray(model.shift)) \
            / np.asarray(model.scale)
        # the oracle must integrate the SAME momentum draw the model makes
        p0 = np.asarray(
            jax.random.normal(k_lp, q0.shape, jnp.float32), np.float64
        )
        B, D = q0.shape
        rhs = symplectic_rhs_f64(model.params)(D)
        y0 = np.concatenate([q0, p0], axis=1).ravel()
        ys, nst = numpy_dopri5(rhs, y0, [0.0, 1.0], 1e-9, 1e-9)
        z1 = ys[-1].reshape(B, 2 * D)
        truth = (
            std_normal_logprob_f64(z1)
            - std_normal_logprob_f64(p0)
            - np.sum(np.log(np.asarray(model.scale, np.float64)))
        )
        draws.append((np.asarray(x, np.float64), k_lp, truth))
        print(f"symplectic draw {i}: oracle steps={nst}", flush=True)

    def run(row, j, draw):
        name, method, tol, opts = row
        x, k_lp, truth = draw
        lp, st = jax.jit(
            lambda mm, kk, xx: mm.log_prob(
                kk, xx, atol=tol, rtol=tol, method=method,
                options=dict(opts),
            )
        )(model, k_lp, jnp.asarray(x, jnp.float32))
        return lp, int(np.max(np.asarray(st.n_func_evals))), truth

    return _cells(run, SYM_LADDER, draws)


def main():
    import argparse

    from benchmarks.bench_suite import provenance_meta

    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--rows", type=int, default=64)
    args = ap.parse_args()

    print("== flow ==")
    flow_cells = flow_frontier(args.draws, args.rows)
    print("== symplectic ==")
    sym_cells = symplectic_frontier(args.draws, args.rows)

    out = {
        "meta": provenance_meta(
            fields="committed benchmarks/flow_ckpt.npz + "
            "symplectic_ckpt.npz",
            oracle="NumPy f64 dopri5 @1e-8 (flow) / @1e-9 joint-(q,p) "
            "with matched momentum draw (symplectic) — tests/oracles.py",
            draws=args.draws, rows_per_draw=args.rows,
            strict_bar="worst-draw mean<=1e-4 AND max<=5e-4",
        ),
        "flow": flow_cells,
        "symplectic": sym_cells,
    }
    path = os.path.join(_HERE, "flow_sym_frontier.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
