"""Sketch-estimator accuracy battery on the committed flagship field.

Round-4 VERDICT weak #4: the ``sketch/*`` rows in strict_1m.json
(Hutch++ r=m=1, XTrace m=2 — the single-dispatch kernel configs) carried
no measured accuracy contract, unlike the Hutchinson row whose
signed-bias/sqrt(N) analysis justifies its "strict twin" framing.  This
battery gives them the identical treatment:

  * 512 rows (8 independent 64-row draws, each with its own f64@1e-8
    ground truth from the NumPy oracle and its own probe key);
  * per-row signed error vs truth at dopri5@1.5e-6 PI (the strict-mode
    step counts) for hutchinson / hutchpp / xtrace, with exact-trace as
    the solver-error floor;
  * signed mean +- standard error (bias test), |error| percentiles, and
    the sqrt(N) scaling of the SUMMED error over nested subsets (an
    unbiased estimator's summed error grows ~sigma*sqrt(N); a biased one
    grows ~bias*N).

CPU-runnable: the plain-XLA estimators are the same algorithms the
Pallas sketch kernels implement (kernel-vs-XLA parity is pinned by
tests/test_kernels.py), so estimator statistics measured here transfer.

Run:  python benchmarks/bench_sketch_accuracy.py [--draws 8] [--rows 64]
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

MODES = ["exact", "hutchinson", "hutchpp", "xtrace"]
TOL = 1.5e-6


def main():
    import argparse

    from oracles import (
        numpy_dopri5,
        vesde_likelihood_rhs_f64,
        vesde_prior_logprob_f64,
    )

    from bench import build_trained_model
    from benchmarks.bench_suite import provenance_meta

    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=8)
    ap.add_argument("--rows", type=int, default=64)
    args = ap.parse_args()

    # build_trained_model returns the standardization stats matched to the
    # model it built — the checkpoint extras when the committed flagship
    # field loads, or the quick-trained field's own stats in the fallback
    # path (re-reading the npz here would crash when the checkpoint is
    # absent AND mismatch the fallback model's standardization).
    base, _, (shift, scale) = build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    from flowfusion_tpu.utils.data import DEMO_GMM

    # -- per-draw truths -------------------------------------------------
    draws = []
    for i in range(args.draws):
        xs = DEMO_GMM.sample(jax.random.PRNGKey(300 + i), args.rows)
        xs = np.asarray((xs - shift) / scale, np.float64)
        B, D = xs.shape
        rhs = vesde_likelihood_rhs_f64(base.params)(D)
        y0 = np.concatenate([xs.ravel(), np.zeros(B)])
        ys, nfe = numpy_dopri5(
            rhs, y0, [float(base.sde.epsilon), 1.0], 1e-8, 1e-8
        )
        yT = ys[-1]
        truth = yT[B * D:] + vesde_prior_logprob_f64(
            yT[: B * D].reshape(B, D)
        )
        draws.append((xs, truth))
        print(f"draw {i}: oracle NFE={nfe}", flush=True)

    # -- estimator errors at the strict-mode step counts ------------------
    out_modes = {}
    for mode in MODES:
        m = dataclasses.replace(
            base, trace_mode=mode, use_fused_kernel=False,
            hpp_rank=1, hpp_vecs=1, xt_vecs=2,
        )
        errs = []
        nfes = []
        for j, (xs, truth) in enumerate(draws):
            lp, st = jax.jit(
                lambda mm, xx, kk: mm.log_prob(
                    xx, key=kk, atol=TOL, rtol=TOL,
                    options={"controller": "pi"},
                )
            )(m, jnp.asarray(xs, jnp.float32), jax.random.PRNGKey(40 + j))
            errs.append(np.asarray(lp, np.float64) - truth)
            nfes.append(int(np.max(np.asarray(st.n_func_evals))))
        e = np.concatenate(errs)  # (draws*rows,) signed
        n = e.size
        abs_e = np.abs(e)
        # sqrt(N) scaling of the SUMMED error over nested subsets: one
        # draw, two draws, four draws, all — derived from --rows so
        # non-default sizes don't mislabel clipped subsets (e[:256] on a
        # 128-row run would silently duplicate the total)
        subset_sizes = sorted(
            {min(args.rows * m, n) for m in (1, 2, 4)} | {n}
        )
        sums = {str(k): float(abs(e[:k].sum())) for k in subset_sizes}
        out_modes[mode] = {
            "rows": n,
            "nfe": max(nfes),
            "signed_mean": float(e.mean()),
            "standard_error": float(e.std(ddof=1) / np.sqrt(n)),
            "bias_consistent_with_zero": bool(
                abs(e.mean()) <= 2.0 * e.std(ddof=1) / np.sqrt(n)
            ),
            "std": float(e.std(ddof=1)),
            "abs_p50": float(np.percentile(abs_e, 50)),
            "abs_p90": float(np.percentile(abs_e, 90)),
            "abs_p99": float(np.percentile(abs_e, 99)),
            "abs_max": float(abs_e.max()),
            "sum_abs_error_by_n": sums,
            "sqrtN_prediction_at_n": float(
                e.std(ddof=1) * np.sqrt(n)
            ),
        }
        r = out_modes[mode]
        print(
            f"{mode:10s} signed {r['signed_mean']:+.2e} +- "
            f"{r['standard_error']:.2e}  p50 {r['abs_p50']:.2e}  "
            f"p99 {r['abs_p99']:.2e}  max {r['abs_max']:.2e}  "
            f"|sum| {sums[str(n)]:.3f} vs sqrtN {r['sqrtN_prediction_at_n']:.3f}",
            flush=True,
        )

    out = {
        "meta": provenance_meta(
            field="committed flagship (benchmarks/flagship_ckpt.npz)",
            tolerance=TOL,
            protocol=f"{args.draws} x {args.rows} rows, per-draw f64@1e-8 "
            "oracle, per-draw probe keys, dopri5 PI (strict-mode step "
            "counts), plain-XLA estimators (kernel parity: test_kernels)",
            sketch_configs="hutchpp r=1 m=1; xtrace m=2 (the strict_1m "
            "kernel configs)",
        ),
        "modes": out_modes,
    }
    path = os.path.join(_HERE, "sketch_accuracy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
