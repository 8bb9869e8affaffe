"""Benchmark suite: every headline workload, plain vs fused vs bf16.

Prints a table (one row per configuration) and writes
``benchmarks/results.json`` (``results_quick.json`` under ``--quick``,
so smoke runs never clobber the committed snapshot).  The single-line
driver metric lives in ``bench.py``; this suite is for humans tuning
the framework.

Workloads (BASELINE.md / BASELINE.json configs):
  * probability-flow log-prob, hutchinson & (off-TPU) exact/hutchpp/xtrace
  * Euler--Maruyama sampling (scan path and fused-kernel path)
  * probability-flow ODE sampling
  * DSM train step throughput

Usage:  python benchmarks/bench_suite.py [--batch 50000] [--steps 100] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_HERE = (
    os.path.dirname(os.path.abspath(__file__))
    if "__file__" in globals()
    else os.path.join(os.getcwd(), "benchmarks")
)
sys.path.insert(0, os.path.join(_HERE, ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force a real device sync: on this sandbox's remote-TPU relay,
    block_until_ready alone can return before execution and identical
    dispatches may be served from a cache — fetch one element to be sure."""
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    return out


def timeit(fn, *argsets, iters=3):
    """fn is called with argsets[i] per iteration — every iteration MUST
    get distinct arguments (see _sync): argsets[0] warms up/compiles and
    each timed iteration consumes the next one."""
    if len(argsets) < iters + 1:
        raise ValueError(
            f"timeit needs {iters + 1} distinct argsets (1 warmup + "
            f"{iters} timed); got {len(argsets)} — the relay serves cached "
            "results for repeated identical arguments"
        )
    _sync(fn(*argsets[0]))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*argsets[i + 1]))
        best = min(best, time.perf_counter() - t0)
    return best


def warn_if_implausible(name, best, quick):
    """A relay cache hit returns in ~1-5 ms regardless of the work; at the
    default (non --quick) batch sizes every real workload here takes far
    longer.  Quick mode is exempt (4096-row runs legitimately finish in
    milliseconds)."""
    if not quick and best < 0.02:
        print(
            f"WARNING: {name} timed {best*1e3:.1f} ms — possible relay "
            "cache hit",
            file=sys.stderr,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=50_000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--train-steps", type=int, default=200)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.batch, args.steps, args.train_steps = 4096, 20, 20

    from bench import build_trained_model

    on_tpu = jax.default_backend() == "tpu"
    model, x, _ = build_trained_model(jax.random.PRNGKey(0), steps=args.train_steps)
    x = x[: args.batch]
    n = x.shape[0]
    results = {}

    def record(name, seconds, per_what=n):
        rate = per_what / seconds
        results[name] = {"seconds": round(seconds, 4), "rate": round(rate, 1)}
        print(f"{name:44s} {seconds:8.3f}s   {rate:>14,.0f}/s")

    # --- log-prob -----------------------------------------------------
    def lp(m):
        return jax.jit(
            lambda mm, xx, k: mm.log_prob(xx, key=k, atol=1e-5, rtol=1e-5, options=None)[0]
        )

    configs = [
        ("logprob/hutchinson/plain-f32", dict(trace_mode="hutchinson", use_fused_kernel=False)),
        ("logprob/hutchinson/fused-f32", dict(trace_mode="hutchinson", use_fused_kernel=True)),
        (
            "logprob/hutchinson/fused-highf32",
            dict(trace_mode="hutchinson", use_fused_kernel=True, kernel_compute_dtype="highf32"),
        ),
        (
            "logprob/hutchinson/fused-bf16",
            dict(trace_mode="hutchinson", use_fused_kernel=True, kernel_compute_dtype="bfloat16"),
        ),
    ]
    if on_tpu:
        # exact trace on TPU runs through the fused basis-tangent kernel
        # (the pure-XLA exact graph crashes this platform's AOT compiler)
        configs.insert(0, ("logprob/exact/fused", dict(use_fused_kernel=True)))
        configs.append(("logprob/hutchpp/fused", dict(trace_mode="hutchpp", hpp_rank=1, hpp_vecs=1, use_fused_kernel=True)))
        configs.append(("logprob/xtrace/fused", dict(trace_mode="xtrace", xt_vecs=2, use_fused_kernel=True)))
        # throughput mode for the sketch estimators: same 3-pass split-dot
        # + tanh-sigmoid as the Hutchinson headline; step counts identical
        # to strict f32 and mean |dlogp| ~3e-5 (verified off-device)
        configs.append(("logprob/hutchpp/fused-highf32", dict(trace_mode="hutchpp", hpp_rank=1, hpp_vecs=1, use_fused_kernel=True, kernel_compute_dtype="highf32")))
        configs.append(("logprob/xtrace/fused-highf32", dict(trace_mode="xtrace", xt_vecs=2, use_fused_kernel=True, kernel_compute_dtype="highf32")))
    else:
        configs.insert(0, ("logprob/exact/plain-f32", dict(use_fused_kernel=False)))
        configs.append(("logprob/hutchpp/plain-f32", dict(trace_mode="hutchpp", hpp_rank=1, hpp_vecs=1, use_fused_kernel=False)))
        configs.append(("logprob/xtrace/plain-f32", dict(trace_mode="xtrace", xt_vecs=2, use_fused_kernel=False)))

    lp_keys = jax.random.split(jax.random.PRNGKey(42), 4)
    for name, kw in configs:
        m = dataclasses.replace(model, **kw)
        f = lp(m)
        # distinct data per iteration (i*1e-6, sub-tolerance): the relay
        # cache has been observed to hit on key-only variation
        best = timeit(f, *[(m, x + i * 1e-6, lp_keys[i]) for i in range(4)])
        warn_if_implausible(name, best, args.quick)
        record(name, best)

    # --- flow-matching CNF log-prob ----------------------------------
    # Reference headline: flow exact-trace log_prob 10.79 s for 25k pts at
    # atol=rtol=1e-4 (~2,317 evals/s; demo_flow.ipynb cell 14) — measured
    # here at the same tolerances.
    from flowfusion_tpu.models.flow import ODEFlow
    from flowfusion_tpu.models.symplectic import SymplecticFlowModel
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    def quick_train(key, base, loss_call, xtr, steps, batch=4096):
        """Brief jitted-scan training so the benchmark solves integrate a
        realistic (trained) field — same protocol as bench.build_trained_model."""
        import optax

        tx = optax.adam(1e-3)
        opt_state = tx.init(base.params)

        def step(carry, k):
            params, opt_state = carry
            kb, kl = jax.random.split(k)
            idx = jax.random.randint(kb, (batch,), 0, xtr.shape[0])

            def loss_fn(p):
                return loss_call(dataclasses.replace(base, params=p), kl, xtr[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), loss

        keys = jax.random.split(key, steps)
        (params, _), _ = jax.lax.scan(step, (base.params, opt_state), keys)
        return dataclasses.replace(base, params=params)

    x_raw = DEMO_GMM.sample(jax.random.PRNGKey(11), n)
    fshift, fscale = standardization_stats(x_raw)
    flow = ODEFlow.create(
        jax.random.PRNGKey(12), target_dimension=2, hidden_units=(128, 128),
        target_shift=fshift, target_scale=fscale,
    )
    flow = quick_train(
        jax.random.PRNGKey(13), flow,
        lambda m, k, xb: m.flow_matching_loss(k, xb), x_raw, args.train_steps,
    )

    flow_lp = jax.jit(
        lambda m, xx, k: m.log_prob(xx, key=k, atol=1e-4, rtol=1e-4)[0]
    )
    flow_lp_ps = jax.jit(
        lambda m, xx, k: m.log_prob_per_sample(xx, key=k, atol=1e-4, rtol=1e-4)[0]
    )
    flow_keys = jax.random.split(jax.random.PRNGKey(14), 4)
    for name, f, m in (
        ("flow-logprob/exact/batch-stepped", flow_lp, flow),
        ("flow-logprob/exact/per-sample", flow_lp_ps, flow),
        (
            "flow-logprob/exact/highf32",
            flow_lp,
            dataclasses.replace(flow, kernel_compute_dtype="highf32"),
        ),
    ):
        best = timeit(
            f, *[(m, x_raw + i * 1e-6, flow_keys[i]) for i in range(4)]
        )
        warn_if_implausible(name, best, args.quick)
        record(name, best)

    # --- symplectic (trace-free) log-prob ----------------------------
    # No reference timing exists (the reference never times this module);
    # the row documents the cheapest likelihood in the framework.
    sym = SymplecticFlowModel.create(
        jax.random.PRNGKey(15), n_data_dims=2, units=(128, 128),
        shift=fshift, scale=fscale,
    )
    sym = quick_train(
        jax.random.PRNGKey(16), sym,
        lambda m, k, xb: m.loss_fn(k, xb), x_raw, args.train_steps,
    )
    sym_lp = jax.jit(lambda m, k, xx: m.log_prob(k, xx)[0])
    sym_configs = [("symplectic-logprob/fused", sym)]
    if not on_tpu:
        sym_configs = [
            ("symplectic-logprob/plain-f32",
             dataclasses.replace(sym, use_fused_kernel=False))
        ]
    sym_keys = jax.random.split(jax.random.PRNGKey(17), 4)
    for name, m in sym_configs:
        best = timeit(
            sym_lp, *[(m, sym_keys[i], x_raw + i * 1e-6) for i in range(4)]
        )
        warn_if_implausible(name, best, args.quick)
        record(name, best)

    # --- EM sampling --------------------------------------------------
    # sample_sde takes no data argument, so vary the MODEL per iteration
    # (sub-tolerance param perturbation) as well as the key — key-only
    # variation has been observed to hit the relay cache.
    def model_variants(base):
        return [
            (
                dataclasses.replace(
                    base,
                    params=jax.tree_util.tree_map(
                        lambda a: a + i * 1e-7, base.params
                    ),
                ),
                jax.random.PRNGKey(1000 + i),
            )
            for i in range(4)
        ]

    em_scan = jax.jit(
        lambda mm, k: mm.sample_sde(k, (n, 2), steps=args.steps).x_mean
    )
    m_plain = dataclasses.replace(model, use_fused_kernel=False)
    best = timeit(em_scan, *model_variants(m_plain))
    warn_if_implausible("em-sample/scan", best, args.quick)
    record(f"em-sample/{args.steps}steps/scan", best)

    em_fused = jax.jit(
        lambda mm, k: mm.sample_sde_fused(k, (n, 2), steps=args.steps).x_mean
    )
    try:
        best = timeit(em_fused, *model_variants(model))
        warn_if_implausible("em-sample/fused", best, args.quick)
        record(f"em-sample/{args.steps}steps/fused-kernel", best)
        m_bf16 = dataclasses.replace(model, kernel_compute_dtype="bfloat16")
        best = timeit(em_fused, *model_variants(m_bf16))
        record(f"em-sample/{args.steps}steps/fused-bf16", best)
    except Exception as e:
        print(f"fused EM unavailable: {type(e).__name__}: {e}")

    # --- ODE sampling -------------------------------------------------
    bases = [
        (jax.random.normal(jax.random.PRNGKey(5 + i), (n, 2)),) for i in range(4)
    ]
    ode = jax.jit(lambda z: m_plain.sample_ode_from_base(z, atol=1e-4, rtol=1e-4)[0])
    best = timeit(ode, *bases)
    record("ode-sample/plain", best)

    dpm = jax.jit(lambda z: model.sample_dpm(z, steps=12, order=2))
    best = timeit(dpm, *bases)
    record("ode-sample/dpm12", best)

    # --- train step ---------------------------------------------------
    import optax

    tx = optax.adam(1e-3)
    # Measure the way training actually runs (train.fit): one dispatch
    # scans many steps, so per-dispatch latency is amortized away.
    # bs 256 mirrors the reference notebook's largest stage; the large
    # batch shows the TPU-schedule throughput regime (samples/s).
    scan_steps = 100

    def train_step_inner(params, opt_state, key, xb):
        def loss_fn(p):
            m = dataclasses.replace(model, params=p)
            return m.loss_fn(key, xb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def train_scan(params, opt_state, key, xs):
        def body(carry, inp):
            p, o = carry
            k, xb_ = inp
            p, o, loss = train_step_inner(p, o, k, xb_)
            return (p, o), loss

        keys = jax.random.split(key, scan_steps)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), (keys, xs))
        return params, opt_state, losses[-1]

    for bs in (256, 16384):
        opt_state = tx.init(model.params)
        idx = jax.random.randint(
            jax.random.PRNGKey(9), (scan_steps, bs), 0, n
        )
        xs = x[idx]  # (scan_steps, bs, D)
        params, opt_state, loss = train_scan(
            model.params, opt_state, jax.random.PRNGKey(1), xs
        )
        _sync(loss)
        # timed call: params differ from the warmup's (they were trained),
        # and xs is perturbed too — belt and braces against the relay
        # cache.  The perturbed batch is materialized BEFORE the timed
        # window (an eager elementwise op through the relay costs
        # hundreds of ms and would dominate the measurement).
        xs2 = _sync(jax.jit(lambda a: a + 1e-6)(xs))
        t0 = time.perf_counter()
        params, opt_state, loss = train_scan(
            params, opt_state, jax.random.PRNGKey(2), xs2
        )
        _sync(loss)
        per_step = (time.perf_counter() - t0) / scan_steps
        record(f"train-step/bs{bs}(scanned)", per_step, per_what=1)
        record(f"train-throughput/bs{bs}", per_step, per_what=bs)

    # quick smoke runs must not clobber the committed full-batch snapshot
    out_name = "results_quick.json" if args.quick else "results.json"
    out_path = os.path.join(_HERE, out_name)
    with open(out_path, "w") as f:
        json.dump(
            {"backend": jax.default_backend(), "batch": n, "results": results}, f, indent=2
        )
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main()
