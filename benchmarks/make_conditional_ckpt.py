"""Train + commit the conditional flagship benchmark checkpoint.

Produces ``benchmarks/conditional_ckpt.npz`` (MLP[128,128,128] — the
BASELINE.json configs[4] workload shape) and, with ``--units 256``,
``benchmarks/conditional_ckpt_h256.npz`` (the capacity-sweep MFU-peak
width, benchmarks/capacity.json: ~79% MXU issue at H=256-384 vs ~62% at
H=128): a conditional population-diffusion model (6-D theta | 3-D c,
VP-SDE, Hutchinson trace, ``highf32`` serving kernel) trained on the
analytic ``ConditionalPopulation`` family.

Why committed: round-4 VERDICT — the north-star conditional workload had
no committed field, so every strict/frontier number for it was
unreproducible.  These checkpoints are what
``benchmarks/bench_conditional_frontier.py`` (tolerance ladder x f64
oracle x trace mode) and the ``tests/test_checkpoint_quality.py`` conditional
gate run against, and what bench.py-adjacent TPU rate rows load.

The training protocol mirrors ``examples/demo_conditional_population.py``
(same PRNG-key layout — k_data/k_net/k_fit/k_eval from PRNGKey(0), same
wrapper and standardization) with a longer staged schedule; the flagship
2-D checkpoint's round-3 lesson (protocol fidelity: a different key
layout cost 5x in density error) applies verbatim.

Run:  python benchmarks/make_conditional_ckpt.py [--units 128|256]
          [--epochs N] [--n-train N] [--out PATH]
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

N_TRAIN = 200_000
STAGES = ((256, 1e-3), (512, 3e-4), (512, 1e-4), (512, 3e-5))
# 600 epochs/stage (round-5 sweep): training SMOOTHS the field — at
# dopri5@1e-5 the 60/200/600-epoch fields measure NFE 350/290/266 with
# solver error 4.2e-3/1.7e-3/1.7e-3 and quality offset -0.0115/-0.0072/
# -0.0063 nats (scatter 0.201/0.168/0.136).  NFE saturates ~260 (the
# protocol-rate ceiling this buys is ~855k evals/s single-chip; the
# >=1e6 structural negative stands — BENCHMARKS.md).  ~56 min on the
# sandbox's 1-core CPU; minutes on a TPU chip.
EPOCHS_PER_STAGE = 600
EMA_DECAY = 0.999


def eval_offsets(model, n_eval: int = 50_000, seed: int = 9,
                 atol: float = 1e-5, rtol: float = 1e-5):
    """(mean offset, de-biased scatter) in nats vs the analytic family.

    Hutchinson trace at 1e-5 with the PI controller — the BASELINE
    workload's serving protocol (demo_conditional_population.py), so the
    recorded quality is the quality OF the benchmarked configuration.
    """
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    theta, c = CONDITIONAL_POP.sample(jax.random.PRNGKey(seed), n_eval)
    lp, _ = model.log_prob(
        theta, conditional=c, key=jax.random.PRNGKey(1),
        atol=atol, rtol=rtol, volume_corrected=True,
        options={"controller": "pi"},
    )
    truth = CONDITIONAL_POP.log_prob(theta, c)
    bias = float(jnp.mean(lp - truth))
    rmse = float(jnp.sqrt(jnp.mean((lp - truth - bias) ** 2)))
    return bias, rmse


def main():
    import argparse

    from flowfusion_tpu.models.population import PopulationModelDiffusion
    from flowfusion_tpu.ops.sde import VPSDE
    from flowfusion_tpu.train import fit
    from flowfusion_tpu.utils.checkpoint import save_npz
    from flowfusion_tpu.utils.data import CONDITIONAL_POP, standardization_stats

    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=128, choices=(128, 256))
    ap.add_argument("--epochs", type=int, default=EPOCHS_PER_STAGE)
    ap.add_argument("--n-train", type=int, default=N_TRAIN)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ema", type=float, default=EMA_DECAY)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="resumable fit snapshots (preemptible hosts)")
    args = ap.parse_args()
    out = args.out or os.path.join(
        _HERE,
        "conditional_ckpt.npz" if args.units == 128
        else "conditional_ckpt_h256.npz",
    )

    key = jax.random.PRNGKey(0)
    k_data, k_net, k_fit, k_eval = jax.random.split(key, 4)

    theta, c = CONDITIONAL_POP.sample(k_data, args.n_train)
    shift, scale = standardization_stats(theta)
    c_shift, c_scale = standardization_stats(c)

    model = PopulationModelDiffusion.create(
        k_net,
        VPSDE(),
        n_dimensions=CONDITIONAL_POP.theta_dim,
        n_conditionals=CONDITIONAL_POP.cond_dim,
        units=(args.units,) * 3,
        shift=shift,
        scale=scale,
        conditional_shift=c_shift,
        conditional_scale=c_scale,
        no_sigma=True,
        trace_mode="hutchinson",
        kernel_compute_dtype="highf32",
    )

    t0 = time.time()
    model, results = fit(
        model, k_fit, theta, conditional_train=c,
        stages=STAGES, epochs_per_stage=args.epochs,
        log_every=max(1, args.epochs // 3), ema_decay=args.ema,
        checkpoint_dir=args.checkpoint_dir,
    )
    train_s = time.time() - t0
    print(f"training done in {train_s:.0f}s on {jax.default_backend()}")

    bias, rmse = eval_offsets(model)
    bias2, rmse2 = eval_offsets(model, seed=7)
    print(f"vs analytic truth (hutch@1e-5 PI, 50k rows): "
          f"offset {bias:+.4f}/{bias2:+.4f} nats, "
          f"scatter {rmse:.4f}/{rmse2:.4f} nats")

    from benchmarks.bench_suite import git_commit

    commit = git_commit()

    save_npz(
        out,
        model,
        extra={
            "family": "conditional_population",
            "units": [args.units] * 3,
            "protocol": {
                "n_train": args.n_train,
                "stages": [list(s) for s in STAGES],
                "epochs_per_stage": args.epochs,
                "ema_decay": args.ema,
            },
            "offset_nats_hutch_1e-5": bias,
            "offset_nats_hutch_1e-5_seed7": bias2,
            "scatter_nats_hutch_1e-5": rmse,
            "scatter_nats_hutch_1e-5_seed7": rmse2,
            "final_train_loss": (
                float(np.asarray(results[-1].train_losses)[-1])
                if results else None
            ),
            "trained_on_backend": jax.default_backend(),
            "jax_version": jax.__version__,
            "git_commit": commit,
            "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "train_seconds": round(train_s, 1),
        },
    )
    print(f"written: {out}")
    print(json.dumps({"offset_nats": bias, "scatter_nats": rmse,
                      "train_seconds": round(train_s, 1)}))


if __name__ == "__main__":
    main()


def load_conditional_model(path: str = None, units: int = 128):
    """Rehydrate a committed conditional checkpoint into a live model.

    Shared loader for the strict bench, the quality gate, and TPU rate
    scripts — keeps the (config -> template -> load_npz) dance in ONE
    place so an envelope change cannot desynchronize them.
    """
    from flowfusion_tpu.models.population import PopulationModelDiffusion
    from flowfusion_tpu.ops.sde import VPSDE
    from flowfusion_tpu.utils.checkpoint import load_npz, read_npz_extra
    from flowfusion_tpu.utils.data import CONDITIONAL_POP

    if path is None:
        path = os.path.join(
            _HERE,
            "conditional_ckpt.npz" if units == 128
            else "conditional_ckpt_h256.npz",
        )
    template = PopulationModelDiffusion.create(
        jax.random.PRNGKey(0),
        VPSDE(),
        n_dimensions=CONDITIONAL_POP.theta_dim,
        n_conditionals=CONDITIONAL_POP.cond_dim,
        units=(units,) * 3,
        no_sigma=True,
        trace_mode="hutchinson",
        kernel_compute_dtype="highf32",
    )
    model = load_npz(path, template)
    return model, read_npz_extra(path)
