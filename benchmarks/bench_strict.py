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
import numpy as np

MODES = [
    # (row name, trace_mode, method, rtol=atol, options, per_sample)
    # exact trace: the mode whose per-row densities the strict accuracy
    # gate (test_checkpoint_quality) actually pins — the coherent
    # "strict >=1e6" claim rides on these rows (round-4)
    ("strict-exact/dopri5-1.5e-6", "exact", "dopri5", 1.5e-6,
     {"controller": "pi"}, False),
    ("strict-exact/dopri5-1e-6", "exact", "dopri5", 1e-6,
     {"controller": "pi"}, False),
    # Hutchinson: same step counts, rows are unbiased with O(1) per-row
    # probe noise (summed/binned densities strict, individual rows not)
    ("strict/dopri5-1.5e-6", "hutchinson", "dopri5", 1.5e-6,
     {"controller": "pi"}, False),
    ("strict/dopri5-1e-6", "hutchinson", "dopri5", 1e-6,
     {"controller": "pi"}, False),
    ("strict/tsit5-1e-6", "hutchinson", "tsit5", 1e-6,
     {"controller": "pi"}, False),
    ("strict/dop853-1e-5", "hutchinson", "dop853", 1e-5,
     {"controller": "pi", "beta": 0.04}, False),
    ("headline/dopri5-1e-5", "hutchinson", "dopri5", 1e-5,
     {"controller": "pi"}, False),
    # sketch estimators at the strict tolerance (VERDICT r3 item 6)
    ("sketch/hutchpp-1.5e-6", "hutchpp", "dopri5", 1.5e-6,
     {"controller": "pi"}, False),
    ("sketch/xtrace-1.5e-6", "xtrace", "dopri5", 1.5e-6,
     {"controller": "pi"}, False),
    # per-sample stepping (VERDICT r3 item 3): measured NEGATIVE on this
    # field — batch-RMS dilution makes the batch-global solve take FEWER
    # steps (254 @1.5e-6) than even the median per-row clock (p50 302,
    # max 416), and the vmapped per-row loop costs max-row steps with no
    # fused kernel.  Row kept so the negative result stays measured.
    ("per-sample/dopri5-1.5e-6", "hutchinson", "dopri5", 1.5e-6,
     None, True),
]


# (row name, trace_mode, method, rtol=atol, options, units)
COND_MODES = [
    # the BASELINE serving protocol (demo_conditional_population.py)
    ("conditional/hutch-1e-5", "hutchinson", "dopri5", 1e-5,
     {"controller": "pi"}, 128),
    # strict candidates — which ARE strict is read off
    # conditional_frontier.json, not assumed here
    ("conditional/exact-1e-5", "exact", "dopri5", 1e-5,
     {"controller": "pi"}, 128),
    ("conditional/exact-1.5e-6", "exact", "dopri5", 1.5e-6,
     {"controller": "pi"}, 128),
    ("conditional/hutch-1.5e-6", "hutchinson", "dopri5", 1.5e-6,
     {"controller": "pi"}, 128),
    # the capacity-informed MFU-peak width (quality-per-time variant)
    ("conditional-h256/hutch-1e-5", "hutchinson", "dopri5", 1e-5,
     {"controller": "pi"}, 256),
]


def _conditional_rows(n_rows: int = 1_000_000):
    """1M-row conditional log-prob rates on the committed field(s).

    Returns {} when no conditional checkpoint is committed yet (keeps
    the 2-D rows runnable standalone).  Each row also records the
    solver NFE so a below-target rate carries its structural breakdown
    (round-4 VERDICT: 594k/s needed an NFE/width explanation, not just
    a number).
    """
    from benchmarks.bench_suite import repeat_slope, stack_of
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    _CKPT = {
        128: os.path.join(_HERE, "conditional_ckpt.npz"),
        256: os.path.join(_HERE, "conditional_ckpt_h256.npz"),
    }
    if not any(os.path.exists(p) for p in _CKPT.values()):
        return {}
    from benchmarks.make_conditional_ckpt import load_conditional_model

    theta, c = CONDITIONAL_POP.sample(jax.random.PRNGKey(5), 50_000)
    reps = n_rows // theta.shape[0]
    theta_big = jnp.tile(theta, (reps, 1))
    c_big = jnp.tile(c, (reps, 1))
    n = theta_big.shape[0]

    rows = {}
    models = {}
    for seed, (name, trace, method, tol, opts, units) in enumerate(
        COND_MODES
    ):
        if not os.path.exists(_CKPT[units]):
            continue
        if units not in models:
            models[units] = load_conditional_model(units=units)[0]
        model = dataclasses.replace(
            models[units],
            score_model=dataclasses.replace(
                models[units].score_model, trace_mode=trace
            ),
        )
        per_solve = (
            lambda xx, kk, m=model, method=method, tol=tol, opts=opts:
            m.log_prob(
                xx[:, : CONDITIONAL_POP.theta_dim],
                conditional=xx[:, CONDITIONAL_POP.theta_dim:],
                key=kk, atol=tol, rtol=tol, method=method,
                options=dict(opts), volume_corrected=True,
            )[0]
        )
        joint = jnp.concatenate([theta_big, c_big], axis=1)
        t = repeat_slope(
            per_solve, stack_of(joint, 900 + 100 * seed), k2=2, reps=3
        )
        if t <= 0:
            print(f"{name}: noise-bound slope, skipped", file=sys.stderr)
            continue
        _, st = jax.jit(
            lambda xx, m=model, method=method, tol=tol, opts=opts:
            m.log_prob(
                xx[:, : CONDITIONAL_POP.theta_dim],
                conditional=xx[:, CONDITIONAL_POP.theta_dim:],
                key=jax.random.PRNGKey(0), atol=tol, rtol=tol,
                method=method, options=dict(opts), volume_corrected=True,
            )
        )(joint[:65536])
        nfe = int(np.max(np.asarray(st.n_func_evals)))
        rows[name] = {
            "seconds": round(t, 4),
            "rate": round(n / t, 1),
            "nfe": nfe,
        }
        print(f"{name:28s} {t:7.3f}s   {n/t:>12,.0f}/s  nfe={nfe}",
              flush=True)
    return rows


def _flow_sym_rows(n_rows: int = 1_000_000):
    """1M-row flow + symplectic likelihood rates on the committed fields.

    Strict-candidate tolerances; which cells meet the strict bar is
    measured in flow_sym_frontier.json (CPU-runnable f64-oracle ladder),
    these are the matching on-chip rates.  Returns {} when the fields
    are not committed yet.
    """
    from benchmarks.bench_suite import repeat_slope, stack_of
    from flowfusion_tpu.utils.data import DEMO_GMM, REFERENCE_GMM

    rows = {}
    flow_path = os.path.join(_HERE, "flow_ckpt.npz")
    sym_path = os.path.join(_HERE, "symplectic_ckpt.npz")
    if os.path.exists(flow_path):
        from benchmarks.make_flow_symplectic_ckpts import load_flow_model

        flow, _ = load_flow_model()
        x = REFERENCE_GMM.sample(jax.random.PRNGKey(6), 50_000)
        x_big = jnp.tile(x, (n_rows // x.shape[0], 1))
        n = x_big.shape[0]
        for seed, (name, trace, tol) in enumerate([
            ("flow/exact-1e-5", "exact", 1e-5),
            ("flow/exact-1.5e-6", "exact", 1.5e-6),
            ("flow/hutch-1.5e-6", "hutchinson", 1.5e-6),
        ]):
            m = dataclasses.replace(flow, trace_mode=trace)
            t = repeat_slope(
                lambda xx, kk, m=m, tol=tol: m.log_prob(
                    xx, key=kk, atol=tol, rtol=tol,
                    options={"controller": "pi"},
                )[0],
                stack_of(x_big, 1500 + 100 * seed), k2=2, reps=3,
            )
            if t <= 0:
                print(f"{name}: noise-bound slope, skipped", file=sys.stderr)
                continue
            rows[name] = {"seconds": round(t, 4), "rate": round(n / t, 1)}
            print(f"{name:28s} {t:7.3f}s   {n/t:>12,.0f}/s", flush=True)
    if os.path.exists(sym_path):
        from benchmarks.make_flow_symplectic_ckpts import load_symplectic_model

        sym, _ = load_symplectic_model()
        x = DEMO_GMM.sample(jax.random.PRNGKey(7), 50_000)
        x_big = jnp.tile(x, (n_rows // x.shape[0], 1))
        n = x_big.shape[0]
        for seed, (name, tol) in enumerate([
            ("symplectic/1e-5", 1e-5),
            ("symplectic/1e-7", 1e-7),
        ]):
            t = repeat_slope(
                lambda xx, kk, m=sym, tol=tol: m.log_prob(
                    kk, xx, atol=tol, rtol=tol,
                    options={"controller": "pi"},
                )[0],
                stack_of(x_big, 2000 + 100 * seed), k2=2, reps=3,
            )
            if t <= 0:
                print(f"{name}: noise-bound slope, skipped", file=sys.stderr)
                continue
            rows[name] = {"seconds": round(t, 4), "rate": round(n / t, 1)}
            print(f"{name:28s} {t:7.3f}s   {n/t:>12,.0f}/s", flush=True)
    return rows


def main():
    from bench import _enable_compile_cache, build_trained_model
    from benchmarks.bench_suite import provenance_meta, repeat_slope, stack_of

    _enable_compile_cache()

    base_model, x, _ = build_trained_model(
        jax.random.PRNGKey(0), from_checkpoint=True
    )
    x_big = jnp.tile(x, (20, 1))
    n = x_big.shape[0]

    results = {}
    for seed, (name, trace, method, tol, opts, per_sample) in enumerate(MODES):
        model = dataclasses.replace(
            base_model, trace_mode=trace, use_fused_kernel=True,
            kernel_compute_dtype="highf32",
            hpp_rank=1, hpp_vecs=1, xt_vecs=2,
        )
        if per_sample:
            # plain per-row closures (no fused kernel, vmapped while)
            model = dataclasses.replace(model, use_fused_kernel=None)
            per_solve = (
                lambda xx, kk, m=model, method=method, tol=tol:
                m.log_prob_per_sample(
                    xx, key=kk, atol=tol, rtol=tol, method=method
                )[0]
            )
        else:
            per_solve = (
                lambda xx, kk, m=model, method=method, tol=tol, opts=opts:
                m.log_prob(
                    xx, key=kk, atol=tol, rtol=tol, method=method,
                    options=opts,
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

    # ---- conditional flagship rows (BASELINE configs[4]; round-5) -----
    # The north-star conditional workload measured at the same 1M scale,
    # on the committed conditional field.  Accuracy side:
    # benchmarks/conditional_frontier.json (f64@1e-8 oracle ladder) and
    # the test_checkpoint_quality conditional gate.
    results.update(_conditional_rows())

    # ---- flow + symplectic strict rows (round-5 VERDICT #5) -----------
    # Accuracy side: benchmarks/flow_sym_frontier.json.
    results.update(_flow_sym_rows())

    out = {
        "meta": provenance_meta(
            batch=n,
            kernel="fused V4 highf32 RHS (trace mode per row name; "
            "per-sample row runs the plain vmapped per-row solver)",
            accuracy_contract="tests/test_checkpoint_quality.py pins "
            "strict-exact/* per-row densities (mean<=1e-4, max<=5e-4 vs "
            "f64@1e-8); strict/* (Hutchinson) share those step counts "
            "with unbiased O(1)-noise rows; sketch/* rows are "
            "variance-reduced estimators; conditional/* rows are the "
            "BASELINE configs[4] workload on the committed conditional "
            "field (accuracy ladder: conditional_frontier.json)",
        ),
        "results": results,
    }
    path = os.path.join(_HERE, "strict_1m.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
