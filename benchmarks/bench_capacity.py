"""Capacity scaling of the fused likelihood path: width x depth sweep.

The committed suite measures one architecture (MLP[128,128,128], the
reference demo).  This sweep shows the fused Pallas RHS kernel is not
shape-overfit: hidden widths are any multiple of 128 and depth is free,
so the same kernel serves bigger score networks.  Each configuration is
quick-trained (200 DSM steps — enough for a realistic field) and timed
with the slope methodology on a 50k batch at the headline settings
(Hutchinson, highf32, rtol=1e-5, PI controller).

Because step counts differ per trained field, the comparable number is
``row_evals_per_s`` (solve rate x RHS evals per solve): the kernel's
per-dispatch throughput.  Writes ``benchmarks/capacity.json``.

Run (real TPU):  python benchmarks/bench_capacity.py
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

ARCHS = [
    ("mlp128x3", (128, 128, 128)),
    ("mlp256x3", (256, 256, 256)),
    ("mlp128x4", (128, 128, 128, 128)),
    ("mlp384x3", (384, 384, 384)),
    # the tile-clamp boundary: vmem_width_clamp floors the batch tile at
    # 256 for H=512's chain budget — shows where MFU peaks (VERDICT r3)
    ("mlp512x3", (512, 512, 512)),
]

# Public per-chip peak dense bf16 matmul throughput, used for absolute
# MFU accounting (issued MXU FLOP/s vs peak).  The fused kernel's
# 'highf32' mode issues 3 bf16 passes per f32 matmul (split-dot), so
# issued = useful x 3; 'float32' (HIGHEST) issues 6.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v4": 275e12,
}


def useful_flops_per_row_eval(units, D=2, E=8, n_cond=0, mode="hutchinson"):
    """Useful f32 FLOPs one RHS evaluation spends per batch row.

    Forward chain MACs: (E + D + C) x H1 + sum H_i x H_{i+1} + H_k x D.
    Each tangent chain (Hutchinson probe: 1; exact trace: D) costs one
    more matmul sweep of the same shapes (the JVP reuses the stored
    activation derivatives, so its extra cost is the matmuls).
    2 FLOPs per MAC.
    """
    arch = (E + D + n_cond, *units, D)
    macs = sum(a * b for a, b in zip(arch, arch[1:]))
    chains = 1 + (D if mode == "exact" else 1)
    return 2 * macs * chains


def main():
    import optax

    from bench import _enable_compile_cache
    from benchmarks.bench_suite import provenance_meta, repeat_slope, stack_of

    _enable_compile_cache()
    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    k_data = jax.random.PRNGKey(1)
    x_raw = DEMO_GMM.sample(k_data, 50_000)
    shift, scale = standardization_stats(x_raw)
    x = (x_raw - shift) / scale

    def quick_train(model, steps=200, batch=4096):
        # NOTE: third sibling of bench.build_trained_model's inline loop
        # and bench_suite.quick_train — the DSM protocol (adam 1e-3,
        # jitted scan, 4096 minibatch) must stay in sync across all
        # three or the benchmarks train different fields; kept separate
        # only because each binds a different loss/key convention.
        tx = optax.adam(1e-3)
        opt_state = tx.init(model.params)

        def step(carry, k):
            params, opt_state = carry
            kb, kl = jax.random.split(k)
            idx = jax.random.randint(kb, (batch,), 0, x.shape[0])

            def loss_fn(p):
                return dataclasses.replace(model, params=p).loss_fn(kl, x[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), loss

        keys = jax.random.split(jax.random.PRNGKey(2), steps)
        (params, _), _ = jax.lax.scan(step, (model.params, opt_state), keys)
        return dataclasses.replace(model, params=params)

    results = {}
    for seed, (name, units) in enumerate(ARCHS):
        cfg = ScoreMLPConfig(n_dimensions=2, units=units)
        model = ScoreModel(
            params=init_score_mlp(jax.random.PRNGKey(3 + seed), cfg),
            net=cfg, sde=VESDE(),
            trace_mode="hutchinson", use_fused_kernel=True,
            kernel_compute_dtype="highf32",
        )
        try:
            model = quick_train(model)
        except Exception as e:
            print(f"{name}: training failed ({e}) — skipped", file=sys.stderr)
            continue

        nfe_holder = {}

        def per_solve(xx, kk, model=model, nfe_holder=nfe_holder):
            lp, st = model.log_prob(
                xx, key=kk, atol=1e-5, rtol=1e-5, options={"controller": "pi"}
            )
            nfe_holder["nfe"] = st.n_func_evals
            return lp

        # one eager solve at the FULL timed batch for this field's step
        # count — the adaptive controller's NFE depends on the batch
        # error norm, and row_evals_per_s (rate * nfe) must use the same
        # batch as the timed slope or the sweep ranks architectures on
        # inconsistent arithmetic
        _ = per_solve(x, jax.random.PRNGKey(9))
        nfe = int(nfe_holder["nfe"])

        t = repeat_slope(per_solve, stack_of(x, 900 + 100 * seed), k2=2, reps=3)
        if t <= 0:
            print(f"{name}: noise-bound slope — skipped", file=sys.stderr)
            continue
        rate = x.shape[0] / t
        n_params = sum(
            p.size for p in jax.tree_util.tree_leaves(model.params)
        )
        flops_row = useful_flops_per_row_eval(units)
        useful = rate * nfe * flops_row
        issued = useful * 3  # highf32 = 3 bf16 MXU passes per f32 matmul
        peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        mfu = (100.0 * issued / peak) if peak else None
        results[name] = {
            "units": list(units),
            "n_params": int(n_params),
            "nfe_at_1e-5": nfe,
            "solve_rate_per_s": round(rate, 1),
            "row_evals_per_s": round(rate * nfe, 1),
            "useful_flops_per_row_eval": flops_row,
            "useful_tflops_per_s": round(useful / 1e12, 2),
            "issued_mxu_tflops_per_s": round(issued / 1e12, 2),
            "mxu_utilization_pct": round(mfu, 1) if mfu is not None else None,
        }
        # measured stats print unconditionally; only the MXU% needs the
        # per-device peak table (a conditional around the WHOLE f-string
        # would swallow rate/nfe on any device kind missing from it)
        mxu_part = (
            f"mxu={mfu:5.1f}%" if mfu is not None
            else "mxu=n/a (device kind not in peak table)"
        )
        print(
            f"{name:10s} params={n_params:>8,d} nfe={nfe:4d} "
            f"rate={rate:>12,.0f}/s  row-evals={rate*nfe:>14,.0f}/s  "
            f"useful={useful/1e12:5.1f}T issued={issued/1e12:6.1f}T "
            + mxu_part,
            flush=True,
        )

    out = {
        "meta": provenance_meta(
            batch=int(x.shape[0]),
            mode="hutchinson fused highf32, rtol=1e-5, PI controller, "
            "200-step quick-trained field per arch",
        ),
        "results": results,
    }
    path = os.path.join(_HERE, "capacity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
